"""Multi-node posture smoke test: the ray-job-submit-shaped CLI runs the
flagship validate against a REAL 2-node Ray cluster (two `ray start`
daemons on this host) via `--address`, and produces bit-identical verdicts
and violations to a single-node local run.  Everything runs in
subprocesses with an isolated --temp-dir, so the session-scoped local Ray
fixture is untouched."""
import json
import os
import subprocess
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

PORT = 6411


def _run(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True, text=True,
                          timeout=300, **kw)


def _verdicts(path):
    return (pq.read_table(path).to_pandas()
            .sort_values(["partition_key", "check_name"], kind="mergesort")
            .reset_index(drop=True))


def _violations(run_dir):
    files = [os.path.join(r, f)
             for r, _, fs in os.walk(os.path.join(run_dir, "violations"))
             for f in fs if f.endswith(".parquet")]
    df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                   ignore_index=True)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.slow
def test_two_node_cluster_validate_matches_local(tmp_path):
    base = str(tmp_path)
    env = {**os.environ, "RAY_GRAFT_CPUS": "4"}
    env.pop("RAY_ADDRESS", None)
    py = sys.executable
    fx = os.path.join(base, "fx")
    prof = os.path.join(base, "prof")
    _run([py, "-m", "sievedata.run", "fixture", "--out", fx,
          "--docs", "800", "--vendors", "8"], env=env, cwd="/root/repo")
    _run([py, "-m", "sievedata.run", "profile",
          "--baseline", f"{fx}/baseline.parquet",
          "--catalog", f"{fx}/media_catalog.parquet", "--out", prof],
         env=env, cwd="/root/repo")

    addr = f"127.0.0.1:{PORT}"
    # short path: Ray's plasma socket lives under temp-dir and AF_UNIX
    # paths are capped at ~107 chars (pytest tmp paths overflow it)
    tmpdir = f"/tmp/sieveray_mn_{os.getpid()}"

    def _stop_cluster():
        # NOT `ray stop --force`: that kills EVERY Ray process on the host,
        # including the session-scoped local Ray's raylet — whose death
        # makes the in-process driver (this pytest process) fatally exit
        # mid-suite.  Kill only daemons whose cmdline references OUR
        # cluster (its temp dir or its GCS port).
        import psutil

        for p in psutil.process_iter(["pid", "cmdline"]):
            try:
                cmd = " ".join(p.info["cmdline"] or [])
                if tmpdir in cmd or f":{PORT}" in cmd:
                    p.kill()
            except (psutil.NoSuchProcess, psutil.AccessDenied):
                pass
    try:
        _run(["ray", "start", "--head", "--num-cpus", "2",
              "--port", str(PORT), "--include-dashboard", "false",
              "--disable-usage-stats", "--temp-dir", tmpdir], env=env)
        _run(["ray", "start", f"--address={addr}", "--num-cpus", "2",
              "--disable-usage-stats"], env=env)
        # two alive nodes, pooled CPUs
        probe = _run([py, "-c", (
            "import ray, json; ray.init(address='%s', logging_level='ERROR');"
            "print(json.dumps([sum(1 for n in ray.nodes() if n['Alive']),"
            "ray.cluster_resources().get('CPU')]))" % addr)], env=env)
        nodes, cpus = json.loads(probe.stdout.strip().splitlines()[-1])
        assert nodes == 2 and cpus == 4.0

        common = ["validate", "--input", f"{fx}/documents.parquet",
                  "--profiles", f"{prof}/profiles.parquet",
                  "--bloom", f"{prof}/media_bloom.bin", "--no-resume"]
        _run([py, "-m", "sievedata.run", "--address", addr, *common,
              "--run-dir", f"{base}/run_cluster"], env=env, cwd="/root/repo")
        s_common = ["score", "--input", f"{fx}/documents.parquet",
                    "--profiles", f"{prof}/profiles.parquet",
                    "--bloom", f"{prof}/media_bloom.bin", "--no-resume"]
        _run([py, "-m", "sievedata.run", "--address", addr, *s_common,
              "--run-dir", f"{base}/srun_cluster"], env=env, cwd="/root/repo")
    finally:
        _stop_cluster()
    _run([py, "-m", "sievedata.run", *common,
          "--run-dir", f"{base}/run_local"], env=env, cwd="/root/repo")
    _run([py, "-m", "sievedata.run", *s_common,
          "--run-dir", f"{base}/srun_local"], env=env, cwd="/root/repo")

    pd.testing.assert_frame_equal(
        _verdicts(f"{base}/run_cluster/verdicts.parquet"),
        _verdicts(f"{base}/run_local/verdicts.parquet"))
    pd.testing.assert_frame_equal(
        _violations(f"{base}/run_cluster"), _violations(f"{base}/run_local"))

    def _decisions(run_dir):
        files = [os.path.join(r, f)
                 for r, _, fs in os.walk(os.path.join(run_dir, "decisions"))
                 for f in fs if f.endswith(".parquet")]
        df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                       ignore_index=True)
        return (df.sort_values("doc_id", kind="mergesort")
                .reset_index(drop=True))

    pd.testing.assert_frame_equal(
        _decisions(f"{base}/srun_cluster"), _decisions(f"{base}/srun_local"))
