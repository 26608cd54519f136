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
step() {
  echo "=== $1 $(date) ==="
  wait_tunnel || return 1
  timeout 2400 bash -c "$2" > "$3" 2> "$4"
  echo "rc=$? $1: $(cat "$3" 2>/dev/null)"
  sleep 60
}
step "qam32 permgate" "python tools/qam32_bench.py" /tmp/qam32_r3.json /tmp/qam32_r3.log
step "warp64 single re" "python tools/genbench.py 64" /tmp/gen64b.json /tmp/gen64b.log
step "warp64 twostage re" "python tools/genbench.py 64 twostage" /tmp/gen64tsb.json /tmp/gen64tsb.log
echo "=== session done $(date) ==="
