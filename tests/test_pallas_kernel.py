"""Pallas count-core kernel == XLA extend_kernel (interpret mode on CPU)."""

import numpy as np
import pytest


@pytest.mark.parametrize("mode,rule,nt3", [
    ("oneway", "C:T", False),
    ("multiway", "A:CGT", False),
    ("nt3", "C:T", True),
])
def test_pallas_counts_match_xla(tmp_path, rng, mode, rule, nt3):
    import jax.numpy as jnp
    from basal_tpu.config import AlignParams
    from basal_tpu.index.reference import load_reference
    from basal_tpu.index.seedindex import build_index
    from basal_tpu.reads.encode import encode_batch
    from basal_tpu.reads.io import ReadRec
    from basal_tpu.align.candidates import SeedScheduler, build_candidates
    from basal_tpu.align.rng import MyRand
    from basal_tpu.ops.extend import extend_kernel
    from basal_tpu.ops.extend_pallas import TILE_C, extend_counts_pallas
    from conftest import make_ref, random_genome

    g = random_genome(rng, 8000)
    make_ref(tmp_path / "ref.fa", [("c1", g)])
    p = AlignParams(conversion=rule, randseed=1, nt3=nt3, chains=1)
    ref = load_reference(str(tmp_path / "ref.fa"), p)
    idx = build_index(ref, p)
    reads = []
    frm, tos = rule.split(":")
    for i in range(64):
        pos = rng.randrange(0, len(g) - 90)
        s = "".join(rng.choice(tos) if (c == frm and rng.random() < 0.5) else c
                    for c in g[pos:pos + 90])
        reads.append(ReadRec(i, 0, f"r{i}", s, "I" * 90))
    enc = encode_batch(p, reads)
    table = build_candidates(p, idx, enc, SeedScheduler(p, idx, MyRand(1)))
    C = table.loc.size
    assert C > 50
    pad = -C % TILE_C
    loc = np.pad(table.loc, (0, pad), constant_values=12800).astype(np.int32)
    plane = np.pad(table.plane, (0, pad)).astype(np.int32)
    row = table.row
    assert (np.diff(row) >= 0).all()
    used, first_idx = np.unique(row, return_index=True)
    # planes indexed by compact rows; build offsets incl. final bound
    row_off = np.concatenate([first_idx, [C + pad]]).astype(np.int32)
    nw = ref.ref32.shape[1]
    args = (jnp.asarray(ref.ref32.reshape(-1)), jnp.asarray(loc),
            jnp.asarray(plane), jnp.asarray(row_off),
            jnp.asarray(enc.base[used]), jnp.asarray(enc.valid[used]),
            jnp.asarray(enc.mread[used]),
            jnp.asarray(np.repeat(enc.n_count, 2)[used].astype(np.int32)))
    want = extend_kernel(args[0], args[1], args[2], args[3], args[4], args[5],
                         args[6], jnp.asarray(enc.lenmask[used]), args[7],
                         jnp.asarray(
                             np.repeat(enc.map_len, 2)[used].astype(np.int32)),
                         mode=mode, gap=0, W=enc.W, nw=nw)
    got = extend_counts_pallas(*args, mode=mode, W=enc.W, nw=nw,
                               interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    # packed entry (the production upload shape): same meta/planes layout
    # the pipeline builds for extend_kernel_packed
    from basal_tpu.ops.extend_pallas import extend_counts_pallas_packed
    U = len(used)
    meta = np.concatenate([
        loc, row_off,
        np.repeat(enc.n_count, 2)[used].astype(np.int32),
        np.repeat(enc.map_len, 2)[used].astype(np.int32)])
    plane_list = [enc.base[used], enc.valid[used]]
    if mode == "multiway":
        plane_list.append(enc.mread[used])
    planes = np.concatenate(plane_list, axis=0)
    got2 = extend_counts_pallas_packed(
        args[0], jnp.asarray(meta), jnp.asarray(planes),
        jnp.asarray(plane.astype(np.uint8)),
        mode=mode, W=enc.W, nw=nw, C=C + pad, U=U,
        n_planes=len(plane_list), interpret=True)
    assert np.array_equal(np.asarray(got2), np.asarray(want))


@pytest.mark.parametrize("mode,rule,gap", [
    ("oneway", "T:-", 3),
    ("oneway", "C:T", 1),
    ("multiway", "A:CGT", 2),
])
def test_pallas_gap_matches_xla(tmp_path, rng, mode, rule, gap):
    """Gapped pallas core == XLA extend_kernel (counts, pos0, pos1)."""
    import jax.numpy as jnp
    import numpy as np
    from basal_tpu.config import AlignParams
    from basal_tpu.index.reference import load_reference
    from basal_tpu.index.seedindex import build_index
    from basal_tpu.reads.encode import encode_batch
    from basal_tpu.reads.io import ReadRec
    from basal_tpu.align.candidates import SeedScheduler, build_candidates
    from basal_tpu.align.rng import MyRand
    from basal_tpu.ops.extend import extend_kernel
    from basal_tpu.ops.extend_pallas import TILE_C, extend_gap_pallas_packed
    from conftest import make_ref, random_genome

    g = random_genome(rng, 8000)
    make_ref(tmp_path / "ref.fa", [("c1", g)])
    p = AlignParams(conversion=rule, randseed=1, gap=gap, chains=1)
    ref = load_reference(str(tmp_path / "ref.fa"), p)
    idx = build_index(ref, p)
    frm, tos = rule.split(":")
    reads = []
    for i in range(64):
        pos = rng.randrange(16, len(g) - 110)
        w = list(g[pos:pos + 108])
        drop = []
        for j, c in enumerate(w):
            if c == frm and rng.random() < 0.15:
                t = rng.choice(tos)
                if t == "-":
                    drop.append(j)
                else:
                    w[j] = t
        for j in reversed(drop[:gap]):
            del w[j]
        reads.append(ReadRec(i, 0, f"r{i}", "".join(w[:100]), "I" * 100))
    enc = encode_batch(p, reads)
    table = build_candidates(p, idx, enc, SeedScheduler(p, idx, MyRand(1)))
    C = table.loc.size
    assert C > 50
    pad = -C % TILE_C
    loc = np.pad(table.loc, (0, pad), constant_values=12800).astype(np.int32)
    plane = np.pad(table.plane, (0, pad)).astype(np.int32)
    row = table.row
    used, first_idx = np.unique(row, return_index=True)
    row_off = np.concatenate([first_idx, [C + pad]]).astype(np.int32)
    U = len(used)
    nw = ref.ref32.shape[1]
    ref32 = jnp.asarray(ref.ref32.reshape(-1))
    ncnt = np.repeat(enc.n_count, 2)[used].astype(np.int32)
    rlen = np.repeat(enc.map_len, 2)[used].astype(np.int32)
    want = extend_kernel(
        ref32, jnp.asarray(loc), jnp.asarray(plane), jnp.asarray(row_off),
        jnp.asarray(enc.base[used]), jnp.asarray(enc.valid[used]),
        jnp.asarray(enc.mread[used]), jnp.asarray(enc.lenmask[used]),
        jnp.asarray(ncnt), jnp.asarray(rlen),
        mode=mode, gap=gap, W=enc.W, nw=nw)
    meta = np.concatenate([loc, row_off, ncnt, rlen])
    plane_list = [enc.base[used], enc.valid[used]]
    if mode == "multiway":
        plane_list.append(enc.mread[used])
    plane_list.append(enc.lenmask[used])
    planes = np.concatenate(plane_list, axis=0)
    got = extend_gap_pallas_packed(
        ref32, jnp.asarray(meta), jnp.asarray(planes),
        jnp.asarray(plane.astype(np.uint8)),
        mode=mode, gap=gap, W=enc.W, nw=nw, C=C + pad, U=U,
        n_planes=len(plane_list), interpret=True)
    for name, a, b in zip(("counts", "pos0", "pos1"), got, want):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
