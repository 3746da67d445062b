"""O12: task retry → effectively-once.

A task that fails mid-extraction on its first attempt must be retried by
Spark and produce EXACTLY the same routed output (routing is a pure
function of row content, never of attempt/partition id).  Runs in a
subprocess because retries need master=local[N,retries].
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import json, os, sys, tempfile
sys.path.insert(0, %(repo)r)
from scones.session import get_spark
from scones.corpus import write_corpus, generate_rows
from scones.extract import extract_documents
from scones.route import with_sink_id
from pyspark import TaskContext
from pyspark.sql import functions as F
import pyarrow as pa

spark = get_spark(master="local[4,2]", app_name="retry-test")
work = tempfile.mkdtemp()
write_corpus(work + "/in", n_docs=80, n_files=4, seed=91)
df = spark.read.parquet(work + "/in/*.parquet").drop("text")

marker = work + "/failed_once"

def flaky(batches):
    ctx = TaskContext.get()
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0 and not os.path.exists(marker):
        open(marker, "w").write("x")
        raise RuntimeError("injected first-attempt failure")
    for b in batches:
        yield b

flaked = df.mapInArrow(flaky, ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields))
out = with_sink_id(extract_documents(flaked), 3).select("url", "sink_id").collect()
print(json.dumps({
    "failed_once": os.path.exists(marker),
    "rows": len(out),
    "routing": sorted([[r.url, r.sink_id] for r in out]),
}))
spark.stop()
"""


def test_task_retry_is_effectively_once():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["failed_once"], "the injected failure never fired"
    assert result["rows"] == 80, "retry lost or duplicated rows"

    from scones.corpus import generate_rows
    from scones.oracle import route

    want = sorted([[r["url"], route(r["url"], 3)] for r in generate_rows(80, seed=91)])
    assert result["routing"] == want, "retried task routed differently"
