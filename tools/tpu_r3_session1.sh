#!/bin/bash
# Round-3 TPU session 1: gen-alphabet + PS benches, then flagship re-validation.
# ONE TPU process at a time; sleep between processes (tunnel recovery).
cd /root/repo
exec 2>&1
echo "=== genbench warp 64 $(date) ==="
timeout 2400 python tools/genbench.py 64 > /tmp/gen64.json 2> /tmp/gen64.log
echo "rc=$? gen64: $(cat /tmp/gen64.json 2>/dev/null)"
sleep 60
echo "=== genbench ps $(date) ==="
timeout 2400 python tools/genbench.py ps > /tmp/genps.json 2> /tmp/genps.log
echo "rc=$? genps: $(cat /tmp/genps.json 2>/dev/null)"
sleep 60
echo "=== genbench warp 256 $(date) ==="
timeout 2400 python tools/genbench.py 256 > /tmp/gen256.json 2> /tmp/gen256.log
echo "rc=$? gen256: $(cat /tmp/gen256.json 2>/dev/null)"
sleep 60
echo "=== bench.py flagship re-validation $(date) ==="
timeout 3000 python bench.py > /tmp/bench_r3a.json 2> /tmp/bench_r3a.log
echo "rc=$? bench: $(cat /tmp/bench_r3a.json 2>/dev/null)"
echo "=== done $(date) ==="
