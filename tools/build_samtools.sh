#!/bin/bash
# Build the vendored samtools 0.1.18 binary out-of-tree as an INDEPENDENT
# validator for our BAM/.bai writers (tests/test_bamindex.py): the reference
# tree ships the full samtools source (SURVEY §2.2), so `samtools index` /
# `samtools view <region>` give an oracle our codec never touched.
# Sources stay in /root/reference (read-only); objects/binary land in .oracle.
set -e
REF=/root/reference/samtools
OUT=/root/repo/.oracle
[ -x "$OUT/samtools" ] && { echo "samtools already built: $OUT/samtools"; exit 0; }
DFLAGS="-D_FILE_OFFSET_BITS=64 -D_LARGEFILE64_SOURCE -D_USE_KNETFILE -D_CURSES_LIB=0"
mkdir -p $OUT/obj/samtools_bin $OUT/obj/bcftools
# libbam.a is already built by build_oracle.sh (obj/samtools); build it if not
[ -f $OUT/obj/samtools/libbam.a ] || bash /root/repo/tools/build_oracle.sh
cd $OUT/obj/bcftools
for o in bcf vcf bcfutils prob1 em kfunc kmin index fet mut bcf2qcall; do
  gcc -c -g -O2 -w $DFLAGS -I$REF/bcftools -I$REF $REF/bcftools/$o.c -o $o.o
done
ar -csr libbcf.a *.o
cd $OUT/obj/samtools_bin
for o in bam_tview bam_plcmd sam_view bam_rmdup bam_rmdupse bam_mate \
         bam_stat bam_color bamtk kaln bam2bcf bam2bcf_indel errmod sample \
         cut_target phase bam2depth; do
  gcc -c -g -O2 -w $DFLAGS -I$REF -I$REF/bcftools $REF/$o.c -o $o.o
done
gcc -g -O2 -o $OUT/samtools *.o -L$OUT/obj/samtools -lbam \
    -L$OUT/obj/bcftools -lbcf -lm -lz -lpthread
echo "samtools built: $OUT/samtools"
