#!/bin/bash
# Dump the formatted plan of each named query to plans/r16/<q>_<tag>.txt
tag=$1; shift
for q in "$@"; do
  sbt -batch "runMain graft.tools.PlanProbe $q" 2>/dev/null \
    | sed -n "/^\[info\] ===== $q/,\$p" | sed 's/^\[info\] //' \
    > plans/r16/${q}_${tag}.txt
done
