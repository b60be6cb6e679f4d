#!/bin/bash
cd /root/repo
for i in $(seq 1 40); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "exit(0 if float('$L') < 1.0 else 1)"; then break; fi
  sleep 30
done
{ echo "=== r11 rgfix benches (row-grouped fixtures + openCost 128KB) ==="; echo "start: $(date) load: $(cat /proc/loadavg)"; } > BENCH_LOCAL_r11_rgfix.uptime.txt
SPARK_GRAFT_SF_DIR=/root/repo/.fixtures/sf1 SPARK_GRAFT_BENCH_ORACLE_RUNS=1 \
  SPARK_GRAFT_BENCH_ORACLE_TIMEOUT=240 python bench.py 2>/dev/null > BENCH_LOCAL_r11_rgfix_sf1.json
echo "after sf1: $(date) load: $(cat /proc/loadavg)" >> BENCH_LOCAL_r11_rgfix.uptime.txt
SPARK_GRAFT_SF_DIR=/root/repo/.fixtures/sf3 SPARK_GRAFT_BENCH_ORACLE_RUNS=1 \
  SPARK_GRAFT_BENCH_ORACLE_TIMEOUT=240 python bench.py 2>/dev/null > BENCH_LOCAL_r11_rgfix_sf3.json
echo "after sf3: $(date) load: $(cat /proc/loadavg)" >> BENCH_LOCAL_r11_rgfix.uptime.txt
touch /root/repo/.r11_rgfix.done
