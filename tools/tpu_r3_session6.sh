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
step "ps post-constants" "python tools/genbench.py ps" /tmp/genps2.json /tmp/genps2.log
step "warp64 twostage post-guard" "python tools/genbench.py 64 twostage" /tmp/gen64ts2.json /tmp/gen64ts2.log
step "qam32 post-guard" "python tools/qam32_bench.py" /tmp/qam32b.json /tmp/qam32b.log
echo "=== session done $(date) ==="
