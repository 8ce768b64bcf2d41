#!/bin/bash
# Isolated BenchOne spot-slopes over a key list at one SF dir.
# usage: spot_slope.sh <sfDir> <outFile> <key...>
SFDIR=$1; OUT=$2; shift 2
: > "$OUT"
for K in "$@"; do
  M=$(SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$SFDIR \
      sbt -batch "runMain graft.BenchOne $K 3" 2>&1 | grep -oE "median [0-9.]+" | awk '{print $2}')
  echo "$K $M" | tee -a "$OUT"
done
