#!/bin/bash
# Round-3 TPU session 3: PS bench, twostage gen bench, 256-pt at 40 dB.
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

run_step "genbench ps nu0.5" "python tools/genbench.py ps" /tmp/genps.json /tmp/genps.log 2400
run_step "genbench warp64 twostage" "python tools/genbench.py 64 twostage" /tmp/gen64ts.json /tmp/gen64ts.log 2400
run_step "genbench warp256 40dB" "python -c \"import sys; sys.path.insert(0,'tools'); import genbench; genbench.main(M=256, snr=40, mu=1e-3)\"" /tmp/gen256b.json /tmp/gen256b.log 2400
echo "=== session done $(date) ==="
