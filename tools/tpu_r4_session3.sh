#!/bin/bash
# Round-4 TPU session 3: planes pipeline + fitted-fine gen measurements.
cd /root/repo
exec 2>&1
wait_tunnel() {
  for i in $(seq 1 12); do
    if timeout 280 python tools/tpu_canary.py > /dev/null 2>&1; then
      echo "tunnel ok after $i canary attempt(s) $(date)"; return 0
    fi
    echo "canary attempt $i failed/hung, sleeping 300 s $(date)"
    sleep 300
  done
  echo "tunnel never recovered"; return 1
}
run_step() {
  echo "=== $1 $(date) ==="
  wait_tunnel || return 1
  timeout "$5" $2 > "$3" 2> "$4"
  echo "rc=$? $1: $(cat "$3" 2>/dev/null)"
  sleep 60
}
run_step "genbench warp64 twostage fitted-both" "python tools/genbench.py 64 twostage" /tmp/r4_gen64_2sc.json /tmp/r4_gen64_2sc.log 2400
run_step "pilot single 80f planes" "python bench.py --pilot-single /tmp/qampy_pilot_tx_nf84.npz 80 1e-5" /tmp/r4_pilot80b.json /tmp/r4_pilot80b.log 1800
run_step "pilot tracking 80f planes" "python bench.py --pilot-tracking /tmp/qampy_pilot_tx_nf84.npz 80 1e-5" /tmp/r4_ptrack80b.json /tmp/r4_ptrack80b.log 1500
run_step "pilotprof 80 frames planes" "python tools/pilotprof.py --tx /tmp/qampy_pilot_tx_nf84.npz --frames 80" /tmp/r4_pprof80c.txt /tmp/r4_pprof80c.log 3600
echo "=== session done $(date) ==="
