#!/bin/bash
# Probe the axon tunnel until it returns, then run the round-4 battery.
# Probes are short (timeout 60) and infrequent (sleep 300) so they don't
# starve the single host core. Waits for any running pytest to finish
# before launching compiles (flag file /tmp/pytest_running).
set -u
cd "$(dirname "$0")/.."
echo "waiter start $(date)" > /tmp/tpu_wait.log
for i in $(seq 1 100); do
  if timeout 60 python -c "import jax; print(jax.devices())" >> /tmp/tpu_wait.log 2>&1; then
    echo "tunnel UP at $(date) (probe $i)" >> /tmp/tpu_wait.log
    touch /tmp/tpu_up
    break
  fi
  echo "probe $i down $(date)" >> /tmp/tpu_wait.log
  sleep 300
done
if [ ! -f /tmp/tpu_up ]; then
  echo "gave up $(date)" >> /tmp/tpu_wait.log
  exit 1
fi
# serialize with any local pytest run
while [ -f /tmp/pytest_running ]; do sleep 60; done
bash tools/round4_battery.sh >> /tmp/tpu_wait.log 2>&1
