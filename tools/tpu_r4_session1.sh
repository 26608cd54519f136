#!/bin/bash
# Round-4 TPU session 1: gen-bf16 validation + pilot per-stage profile.
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

run_step() {  # name cmd out log tmo
  echo "=== $1 $(date) ==="
  wait_tunnel || return 1
  timeout "$5" $2 > "$3" 2> "$4"
  echo "rc=$? $1: $(cat "$3" 2>/dev/null)"
  sleep 60
}

run_step "genbench warp64 twostage bf16dec" "python tools/genbench.py 64 twostage" /tmp/r4_gen64_2s.json /tmp/r4_gen64_2s.log 2400
run_step "genbench warp64 single bf16dec" "python tools/genbench.py 64" /tmp/r4_gen64_1s.json /tmp/r4_gen64_1s.log 2400
run_step "pilotprof 80 frames" "python tools/pilotprof.py --tx /tmp/qampy_pilot_tx_nf84.npz --frames 80" /tmp/r4_pprof80.txt /tmp/r4_pprof80.log 3600
echo "=== session done $(date) ==="
