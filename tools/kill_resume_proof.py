"""Mid-run SIGKILL + resume proof for the flagship job (r4 verdict
next-round #8).

Protocol:
  1. run `jobs/flagship_job.py` to completion in a clean dir -> reference
     per-partition file hashes;
  2. start the same job fresh in a second dir, poll its manifest, and
     SIGKILL the process after the first K partition rows land
     (mid-write by construction — the sink is still streaming);
  3. re-submit the identical command; assert
       a. the resume only (re)writes partitions absent from the manifest
          (pre-kill partition files' mtimes are untouched),
       b. the manifest audit verifies every partition,
       c. the final output is byte-for-byte identical to the
          uninterrupted run (same partition set, same file hashes).

Usage: python tools/kill_resume_proof.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "flagship_job.py")
KILL_AFTER_PARTS = 3


def file_hashes(out_dir: str) -> dict[str, str]:
    out = {}
    for root, _, files in os.walk(out_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, out_dir)
            out[rel] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def run_job(sf_dir: str, out_dir: str) -> dict:
    cmd = [sys.executable, JOB, "--sf-dir", sf_dir, "--out-dir", out_dir,
           "--copies", "2"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        raise RuntimeError(f"job failed: {r.stdout[-2000:]} {r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    base = f"/tmp/kill_resume_{int(time.time())}"
    clean_dir = f"{base}/clean"
    kill_dir = f"{base}/killed"
    os.makedirs(clean_dir, exist_ok=True)
    os.makedirs(kill_dir, exist_ok=True)

    print("1. uninterrupted reference run ...")
    s = run_job(sf_dir, clean_dir)
    print(f"   rows={s['rows_written']} partitions={s['manifest_partitions']}"
          f" manifest_ok={s['manifest_ok']}")
    ref = file_hashes(clean_dir)

    print("2. fresh run, SIGKILL mid-write ...")
    cmd = [sys.executable, JOB, "--sf-dir", sf_dir, "--out-dir", kill_dir,
           "--copies", "2"]
    # new session so SIGKILL hits the WHOLE tree (driver + raylet +
    # workers) — killing only the driver lets Ray workers finish the
    # write phase behind its back
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            start_new_session=True)
    mpath = os.path.join(kill_dir, "_manifest.jsonl")
    deadline = time.time() + 600
    nparts = 0
    while time.time() < deadline:
        # kill on the FIRST parquet files hitting disk — files land before
        # their manifest rows, so this is mid-write by construction
        nparts = sum(
            1 for _, _, files in os.walk(kill_dir)
            for f in files if f.endswith(".parquet"))
        if nparts >= KILL_AFTER_PARTS:
            break
        if proc.poll() is not None:
            raise RuntimeError("job finished before the kill threshold — "
                               "lower KILL_AFTER_PARTS")
        time.sleep(0.005)
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait()
    time.sleep(1.0)  # let any straggler file handles settle
    if not os.path.exists(mpath):
        # killed before any manifest row: resume == full rerun; still a
        # valid crash point, but record it
        open(mpath, "a").close()
    pre = file_hashes(kill_dir)
    pre_mtimes = {
        rel: os.path.getmtime(os.path.join(kill_dir, rel)) for rel in pre
    }
    # only count partitions the manifest actually recorded (a file mid-
    # write at kill time has no manifest row and must be rewritten)
    with open(mpath) as f:
        recorded = {json.loads(ln)["path"] for ln in f if ln.strip()}
    print(f"   killed with {nparts} parquet files on disk ({len(pre)} at "
          f"hash time), {len(recorded)} manifest-recorded")

    print("3. re-submit identical command (resume) ...")
    t_resume = time.time()
    s2 = run_job(sf_dir, kill_dir)
    print(f"   rows={s2['rows_written']} manifest_ok={s2['manifest_ok']}")

    failures = []
    if not s2["manifest_ok"]:
        failures.append("resumed manifest audit failed")
    # (a) recorded pre-kill partitions were not rewritten
    for rel, mt in pre_mtimes.items():
        full = os.path.join(kill_dir, rel)
        if full in recorded and os.path.getmtime(full) > t_resume:
            failures.append(f"recorded partition rewritten: {rel}")
    # (c) byte-for-byte equality with the uninterrupted run
    final = file_hashes(kill_dir)
    if set(final) != set(ref):
        failures.append(
            f"partition sets differ: {set(final) ^ set(ref)}")
    else:
        diff = [r for r in ref if ref[r] != final[r]]
        if diff:
            failures.append(f"{len(diff)} partition files differ byte-wise:"
                            f" {diff[:5]}")
    if failures:
        print("FAIL:", "; ".join(failures))
        return 1
    print(f"PASS: resume skipped {len([r for r in pre_mtimes if os.path.join(kill_dir, r) in recorded])} "
          f"recorded partitions, rewrote the rest; {len(final)} partition "
          f"files byte-identical to the uninterrupted run")
    return 0


if __name__ == "__main__":
    sys.exit(main())
