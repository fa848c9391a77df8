#!/bin/bash
# Keep one persistent TPU worker alive across axon relay outages.
#
# The worker (tools/tpu_worker.py) owns the single tunnel client and
# executes /tmp/tpuq/NNN.py job files in-process (results land next to
# each job as NNN.py.out). A client blocked in make_c_api_client
# (relay outage) never recovers on its own, so a worker that hasn't
# printed WORKER READY within 15 min is killed and retried on a fresh
# socket, with the mandatory >=75 s gap between clients.
#
# Usage: nohup tools/tpu_supervisor.sh &   (one instance only)
while true; do
  echo "[$(date +%H:%M:%S)] starting tpu_worker" >> /tmp/tpu_supervisor.log
  python "$(dirname "$0")/tpu_worker.py" >> /tmp/tpu_worker.log 2>&1 &
  wp=$!
  ready=0
  for i in $(seq 1 90); do
    sleep 10
    if ! kill -0 $wp 2>/dev/null; then break; fi
    if grep -q "WORKER READY" /tmp/tpu_worker.log; then ready=1; break; fi
  done
  if [ $ready -eq 1 ]; then
    echo "[$(date +%H:%M:%S)] worker ready (pid $wp)" >> /tmp/tpu_supervisor.log
    wait $wp
    echo "[$(date +%H:%M:%S)] ready worker exited" >> /tmp/tpu_supervisor.log
  else
    echo "[$(date +%H:%M:%S)] not ready in 15min; restarting" >> /tmp/tpu_supervisor.log
    kill $wp 2>/dev/null
    wait $wp 2>/dev/null
  fi
  rm -f /tmp/tpu_worker.log
  sleep 95
done
