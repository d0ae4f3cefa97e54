"""Per-stage scaling diagnostic: times each pipeline stage at two
parallelism levels in fresh JVMs, so a below-target end-to-end scaling
efficiency can be attributed to the stage that fails to scale.

Usage: python tools/stage_scaling.py [n_conv] [n_cores] (runs N and 4N)
"""

from __future__ import annotations

import json
import subprocess
import sys

CODE = """
import json, os, time
# heap scales with cores, matching bench_scaling's protocol (4 GB/core)
os.environ.setdefault("HDTSPARK_DRIVER_MEM", str({cores} * 4) + "g")
from hdtspark.session import get_spark
from hdtspark import extract, encode, bitmap_triples, synth
from hdtspark.dict_builder import build_dict
from pyspark import StorageLevel

cores = {cores}
# HDTSPARK_EXTRA_CONF: JSON dict of Spark conf overrides — the experiment
# hook (codec choice, buffer sizes) so A/B runs need no code edits
spark = get_spark(app_name='stage-scaling', master=f'local[{cores}]',
                  shuffle_partitions=4 * {cores},
                  extra_conf=json.loads(os.environ.get(
                      'HDTSPARK_EXTRA_CONF', '{{}}')))
# warmup on a small disjoint corpus
w = synth.transcripts_df(spark, seed=7, n_conv=max({n_conv}//10, 200)).cache()
w.count()
tw = extract.extract_triples(w).persist(StorageLevel.DISK_ONLY)
dw = build_dict(tw)
encode.encode_triples(tw, dw).count()

t = synth.transcripts_df(spark, seed=42, n_conv={n_conv}).cache(); t.count()
out = {{}}
t0 = time.monotonic()
tri = extract.extract_triples(t).persist(StorageLevel.DISK_ONLY)
n_tri = tri.count(); t1 = time.monotonic(); out['extract'] = round(t1-t0, 2)
d = build_dict(tri); t2 = time.monotonic(); out['dict'] = round(t2-t1, 2)
spo = encode.encode_triples(tri, d).persist(StorageLevel.MEMORY_AND_DISK)
n_spo = spo.count(); t3 = time.monotonic(); out['encode'] = round(t3-t2, 2)
# pass dict_bits exactly like pipeline.build_kg_from_triples does, so the
# tool times the PACKED exchanges the real build runs
bits = encode.dict_bits(d)
encode.ops_projection(spo, bits=bits).count()
encode.pso_projection(spo, bits=bits).count()
t4 = time.monotonic(); out['projections'] = round(t4-t3, 2)
bitmap_triples.adjacency(spo, bits=bits).count()
t5 = time.monotonic(); out['adjacency'] = round(t5-t4, 2)
out['total'] = round(t5-t0, 2); out['n_triples'] = n_spo; out['cores'] = {cores}
print('RESULT ' + json.dumps(out))
"""


def run(cores: int, n_conv: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CODE.format(cores=cores, n_conv=n_conv)],
        capture_output=True, text=True, cwd="/root/repo", timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    a, b = run(n, n_conv), run(4 * n, n_conv)
    report = {"n_conv": n_conv, "runs": [a, b], "per_stage_speedup": {}}
    for k in ("extract", "dict", "encode", "projections", "adjacency", "total"):
        report["per_stage_speedup"][k] = round(a[k] / b[k], 2) if b[k] else None
    print(json.dumps(report))


if __name__ == "__main__":
    main()
