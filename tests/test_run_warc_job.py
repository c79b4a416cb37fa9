"""scripts/run_warc_job.py contract: the spark-submit raw-crawl job
runs end-to-end in sandbox mode and emits the expected artifacts."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_warc_job_sandbox_mode(tmp_path):
    out = str(tmp_path / "out")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_warc_job.py"),
         "--synthesize", "/root/testdata/sf0.001", "--output", out,
         "--master", "local[4]", "--partitions", "4"],
        capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["articles"] == 500
    assert summary["wet_records"] == 500
    assert summary["other_payloads"] == 0
    for sub in ("articles", "lineage", "wet", "media_stats"):
        assert os.path.isdir(os.path.join(out, sub)), sub
    wet_files = [f for f in os.listdir(os.path.join(out, "wet"))
                 if f.endswith(".warc.wet")]
    assert wet_files and all(".tmp" not in f for f in wet_files)
