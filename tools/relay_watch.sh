#!/bin/sh
# Poll the axon relay tunnel; the moment it answers, run the round-3 TPU
# measurement queue (tools/r3_tpu_queue.sh).  Cheap while waiting (one TCP
# probe per minute).  Usage:
#   nohup sh tools/relay_watch.sh > /tmp/relay_watch.log 2>&1 &
#   echo $! > /tmp/relay_watch.pid
cd /root/repo || exit 1
while :; do
    if python - <<'EOF'
import sys
from buctd_tpu.utils.relay import relay_alive
sys.exit(0 if relay_alive() else 1)
EOF
    then
        echo "relay up at $(date) — running measurement queue"
        sh tools/r3_tpu_queue.sh 2>&1 | tee /tmp/r3q.log
        echo "queue done at $(date)"
        exit 0
    fi
    sleep 60
done
