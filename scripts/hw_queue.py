#!/usr/bin/env python
"""Serial hardware job queue with tunnel-outage retries.

The round-2 bench capture was lost to a device-tunnel outage (rc=124 after
30+ min of in-process waiting); this wrapper makes an outage DELAY a job
instead of killing it. Jobs run one at a time (one TPU process at a time),
each with its own log file; a failed job is retried when a device probe
succeeds again, up to a per-queue deadline. Status is checkpointed to
<logdir>/status.json after every attempt so a watcher can follow along.

Usage:
  python scripts/hw_queue.py --manifest scripts/hwq_r03.json \
      --logdir /tmp/hwq_r03 [--deadline_s 21600]

Manifest format: JSON list of {"name": str, "cmd": [argv...],
"env": {optional extra env}, "timeout_s": optional per-attempt timeout}.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The probe must RUN a computation, not just list devices: a wedged chip
# claim (the known two-process failure mode) keeps device listing alive
# while compute hangs indefinitely — a listing-only probe reports "up"
# forever and burns every attempt. The probe self-terminates via a
# watchdog thread instead of relying on subprocess.run(timeout=...):
# SIGKILLing a TPU client MID-RPC is itself the documented wedge trigger,
# so the parent must never be the one to kill a hanging probe — the probe
# closes its own end (os._exit) before the parent would.
PROBE = """
import os, sys, threading, time
def _watchdog():
    time.sleep(float(sys.argv[1]))
    os._exit(3)
threading.Thread(target=_watchdog, daemon=True).start()
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != 'cpu', d
assert float(jnp.arange(8.0).sum()) == 28.0
"""


def device_up(timeout_s: float = 300.0) -> bool:
    # generous: the probe subprocess shares the host with CPU test suites,
    # and jax import + tunnel init + one tiny compile can exceed 90s under
    # load — a starved probe must not read as a device outage. The
    # subprocess timeout is a last-resort backstop strictly LONGER than the
    # probe's own watchdog so the child always self-exits first.
    try:
        return subprocess.run(
            [sys.executable, "-c", PROBE, str(timeout_s)],
            capture_output=True, timeout=timeout_s + 60).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_device(deadline: float, poll_s: float = 45.0) -> bool:
    # short poll at first: the chip claim can take ~1-2 min to release
    # after a job exits, which reads as one failed probe between
    # back-to-back jobs — a long poll would turn that release lag into
    # dead queue time. But a WEDGED claim (killed-mid-RPC fallout) lasts
    # ~1h server-side, so after a few failures the poll backs off: probing
    # every 45s against a wedge means abandoning a hung probe every few
    # minutes, each an abrupt client disconnect that risks re-kicking the
    # wedge it is trying to outlast.
    fails = 0
    while True:
        if device_up():
            return True
        if time.time() >= deadline:
            return False
        fails += 1
        sleep_s = min(poll_s * (2 ** max(0, fails - 3)), 360.0)
        print(f"hwq: device down ({fails}x), re-probing in {sleep_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(sleep_s)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True)
    p.add_argument("--logdir", required=True)
    p.add_argument("--deadline_s", type=float, default=6 * 3600)
    p.add_argument("--max_attempts", type=int, default=4,
                   help="attempts per job while the device probe passes "
                        "(device-down attempts do not count)")
    args = p.parse_args(argv)

    with open(args.manifest) as f:
        jobs = json.load(f)
    os.makedirs(args.logdir, exist_ok=True)
    deadline = time.time() + args.deadline_s

    def job_hash(j):
        return hashlib.sha256(json.dumps(
            [j["cmd"], j.get("env", {})], sort_keys=True).encode()).hexdigest()[:16]

    hashes = {j["name"]: job_hash(j) for j in jobs}
    status = {j["name"]: {"state": "pending", "attempts": 0,
                          "cmd_hash": hashes[j["name"]]} for j in jobs}
    # restart-safe: completed jobs in an existing status.json stay done, so
    # a queue restart (code fix, host reboot) never re-burns chip time —
    # but only when the job's command is UNCHANGED: resuming 'ok' by name
    # alone would silently skip a revised job and pass off the stale
    # result as current (ADVICE r4)
    prev_path = os.path.join(args.logdir, "status.json")
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            for name, st in json.load(f).items():
                if (name in status and st.get("state") == "ok"
                        and st.get("cmd_hash") == hashes[name]):
                    status[name] = st

    def checkpoint():
        with open(os.path.join(args.logdir, "status.json"), "w") as f:
            json.dump(status, f, indent=1)

    checkpoint()
    last_job_end = 0.0
    for job in jobs:
        name, st = job["name"], status[job["name"]]
        log_path = os.path.join(args.logdir, f"{name}.log")
        if st["state"] == "ok":
            print(f"hwq: {name}: already ok (resumed)", flush=True)
            continue
        while st["attempts"] < args.max_attempts:
            # claim-release grace: probing in the ~1-2 min window right
            # after the previous job exits tends to HANG, and an abandoned
            # hung probe is an abrupt disconnect that can wedge the claim
            # for ~1h — cheaper to just wait the lag out
            lag = time.time() - last_job_end
            if lag < 90.0:
                time.sleep(90.0 - lag)
            if not wait_for_device(deadline):
                st["state"] = "deadline(device down)"
                break
            st["attempts"] += 1
            st["state"] = "running"
            checkpoint()
            env = dict(os.environ, **job.get("env", {}))
            t0 = time.time()
            with open(log_path, "a") as log:
                log.write(f"\n=== hwq attempt {st['attempts']} "
                          f"{time.strftime('%F %T')} ===\n")
                log.flush()
                try:
                    rc = subprocess.run(
                        job["cmd"], cwd=REPO, env=env, stdout=log,
                        stderr=subprocess.STDOUT,
                        timeout=job.get("timeout_s")).returncode
                except subprocess.TimeoutExpired:
                    rc = -1
            st["elapsed_s"] = round(time.time() - t0, 1)
            last_job_end = time.time()
            if rc == 0:
                st["state"] = "ok"
                # keep the job's last stdout json line if there is one
                with open(log_path) as lf:
                    for line in reversed(lf.read().splitlines()):
                        if line.startswith("{"):
                            try:
                                st["result"] = json.loads(line)
                            except ValueError:
                                pass
                            break
                break
            st["state"] = f"failed(rc={rc})"
            if time.time() >= deadline:
                break
            # an outage mid-job exits nonzero but should not burn attempts
            if not device_up():
                st["attempts"] -= 1
            checkpoint()
        checkpoint()
        print(f"hwq: {name}: {st['state']} "
              f"({st.get('elapsed_s', 0)}s, {st['attempts']} attempts)",
              flush=True)
        if time.time() >= deadline:
            for j in jobs:
                if status[j["name"]]["state"] == "pending":
                    status[j["name"]]["state"] = "deadline"
            break
    checkpoint()
    bad = [n for n, s in status.items() if s["state"] != "ok"]
    print("hwq: done;", "all ok" if not bad else f"failed: {bad}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
