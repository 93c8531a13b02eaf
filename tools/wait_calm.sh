#!/bin/bash
# Wait until the VM sees a calm window: foreign busy (incl. host steal)
# under $1 milli-cores (default 400) sampled over 10 s, up to $2 minutes
# (default 30). Prints one line per sample; exits 0 on calm, 1 on timeout.
thr=${1:-400}
maxmin=${2:-30}
deadline=$(( $(date +%s) + maxmin * 60 ))
while true; do
  read -r _ u1 n1 s1 i1 w1 q1 sq1 st1 _ < /proc/stat
  sleep 10
  read -r _ u2 n2 s2 i2 w2 q2 sq2 st2 _ < /proc/stat
  busy=$(( (u2-u1)+(n2-n1)+(s2-s1)+(q2-q1)+(sq2-sq1)+(st2-st1) ))
  # jiffies(100Hz) over 10s => milli-cores = busy jiffies
  mc=$(( busy ))
  echo "[calm] busy ${mc} milli-cores (steal $(( st2-st1 )) jiffies)"
  if (( mc < thr )); then exit 0; fi
  if (( $(date +%s) > deadline )); then echo "[calm] timeout"; exit 1; fi
done
