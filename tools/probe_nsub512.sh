#!/bin/bash
# NSUB bisection at the 512-geometry via the A variant (decode_groups).
cd /root/repo
for n in 4 6 8; do
  echo "=== NSUB=$n"
  LLCT_DECODE_NSUB=$n timeout 1500 python tools/probe_decode_bisect.py A 2>&1 | tail -2
done
