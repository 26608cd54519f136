#!/bin/bash
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
run_step "pilot_ab cpe-coeffs xla-atan2" "python tools/pilot_ab.py /tmp/qampy_pilot_tx_nf84.npz 80 scan_planes,tracking_scan" /tmp/r4_ab4.txt /tmp/r4_ab4.log 2400
run_step "pilot single 80f v2" "python bench.py --pilot-single /tmp/qampy_pilot_tx_nf84.npz 80 1e-5" /tmp/r4_pilot80f.json /tmp/r4_pilot80f.log 1800
run_step "pilot tracking 80f v2" "python bench.py --pilot-tracking /tmp/qampy_pilot_tx_nf84.npz 80 1e-5" /tmp/r4_ptrack80f.json /tmp/r4_ptrack80f.log 1500
echo "=== session done $(date) ==="
