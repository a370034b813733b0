#!/bin/bash
# Round-4 scaling campaigns, sequential, quiet-box protocol.
cd /root/repo
echo "=== dedup campaign start $(date -u +%H:%M:%S) ===" > .scaling_r4_dedup.log
python scripts/dedup_scaling_bench.py 200000 4 16 2 >> .scaling_r4_dedup.log 2>&1
echo "rc=$? end $(date -u +%H:%M:%S)" >> .scaling_r4_dedup.log
echo "=== er head campaign start $(date -u +%H:%M:%S) ===" > .scaling_r4_er_head.log
python scripts/scaling_bench.py 150000 4 16 2 >> .scaling_r4_er_head.log 2>&1
echo "rc=$? end $(date -u +%H:%M:%S)" >> .scaling_r4_er_head.log
echo "ALL CAMPAIGNS DONE $(date -u +%H:%M:%S)"
