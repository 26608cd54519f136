#!/bin/bash
# Round-4 TPU session 5: block-diagonal frame filter + prefix A/B + memprobe.
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
run_step "pilot_ab scan/track/bs512" "python tools/pilot_ab.py /tmp/qampy_pilot_tx_nf84.npz 80 scan_planes,tracking_scan,bs512,bs512_sync5" /tmp/r4_ab1.txt /tmp/r4_ab1.log 3600
run_step "memprobe" "python tools/memprobe.py 21" /tmp/r4_memprobe.json /tmp/r4_memprobe.log 1200
echo "=== session done $(date) ==="
