#!/usr/bin/env python
"""Resilient chip-bench queue: probes the relay before each entry, runs
entries with a timeout, detects device-hang (low CPU burn) and requeues,
logs incrementally. Usage: python scripts/run_queue.py <queue file> <log>.
Queue file: one shell command per line, '#' comments."""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
queue_path, log_path = sys.argv[1], sys.argv[2]


def log(msg):
    with open(log_path, "a") as fh:
        fh.write(f"{time.strftime('%H:%M:%S')} {msg}\n")


def probe():
    try:
        r = subprocess.run(
            ["timeout", "150", "python", "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.ones((8,8)).sum()))"],
            cwd=ROOT, capture_output=True, timeout=170)
        return r.returncode == 0
    except Exception:
        return False


def wait_chip():
    while not probe():
        log("chip down; waiting")
        time.sleep(120)


def run_entry(cmd, timeout=2400):
    """Returns True on success (process exited 0 and printed something
    useful), False on hang/failure."""
    log(f"RUN {cmd}")
    p = subprocess.Popen(cmd, shell=True, cwd=ROOT,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, start_new_session=True)
    t0 = time.time()
    out = []
    import threading

    def reader():
        for line in p.stdout:
            if "WARNING" not in line:
                out.append(line.rstrip())
                log("  | " + line.rstrip())

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    while p.poll() is None:
        time.sleep(20)
        el = time.time() - t0
        if el > timeout:
            try:
                os.killpg(p.pid, 9)
            except Exception:
                p.kill()
            log("  TIMEOUT, killed")
            return False
        # hang detection: after 10 min with no output, check the CPU
        # burned across the whole session (the shell's own stat stays
        # ~0 while its python child works)
        if el > 600 and not out:
            cpu_s = 0.0
            try:
                import glob

                tck = os.sysconf("SC_CLK_TCK")
                for st in glob.glob("/proc/[0-9]*/stat"):
                    try:
                        parts = open(st).read().rsplit(") ", 1)[1].split()
                        # session id is field 3 after the comm field
                        if int(parts[3]) == p.pid:
                            cpu_s += (int(parts[11]) + int(parts[12])) / tck
                    except Exception:
                        continue
            except Exception:
                cpu_s = 1e9
            if cpu_s < 30:
                try:
                    os.killpg(p.pid, 9)
                except Exception:
                    p.kill()
                log(f"  HANG detected (session cpu {cpu_s:.0f}s at "
                    f"{el:.0f}s), killed")
                return False
    th.join(timeout=5)
    ok = p.returncode == 0 and bool(out)
    log(f"  exit {p.returncode} ({'ok' if ok else 'RETRY'})")
    return ok


def main():
    with open(queue_path) as fh:
        entries = [l.strip() for l in fh
                   if l.strip() and not l.startswith("#")]
    attempts = {i: 0 for i in range(len(entries))}
    pending = list(range(len(entries)))
    while pending:
        i = pending.pop(0)
        wait_chip()
        if run_entry(entries[i]):
            continue
        attempts[i] += 1
        if attempts[i] < 3:
            pending.append(i)
        else:
            log(f"GIVE UP on: {entries[i]}")
    log("QUEUE DONE")


if __name__ == "__main__":
    main()
