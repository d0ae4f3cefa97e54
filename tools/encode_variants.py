"""Encode-stage scaling experiment: times encode_triples variants at two
parallelism levels to attribute the stage's sublinear scaling.

Variants: base (current), shj (shuffle-hash-join hint on over-cap dict
joins), packed (single-long packed triple through the range exchange),
shj+packed.

Usage: python tools/encode_variants.py [n_conv] [n_cores]
"""

from __future__ import annotations

import json
import subprocess
import sys

CODE = """
import json, time
from hdtspark.session import get_spark
from hdtspark import extract, encode, synth
from hdtspark.dict_builder import build_dict
from pyspark import StorageLevel
from pyspark.sql import functions as F

cores = {cores}
spark = get_spark(app_name='encode-variants', master=f'local[{cores}]',
                  shuffle_partitions=4 * {cores})
n = 4 * {cores}

t = synth.transcripts_df(spark, seed=42, n_conv={n_conv}).cache(); t.count()
tri = extract.extract_triples(t).persist(StorageLevel.DISK_ONLY)
tri.count()
d = build_dict(tri)

bits_p = (d.n_predicates).bit_length()
bits_s = (d.n_shared + d.n_subjects).bit_length()
bits_o = (d.n_shared + d.n_objects).bit_length()

def joined(shj):
    sd = d.subj_global.withColumnRenamed('term','s').withColumnRenamed('id','sid')
    pd_ = d.predicates.withColumnRenamed('term','p').withColumnRenamed('id','pid')
    od = d.obj_global.withColumnRenamed('term','o').withColumnRenamed('id','oid')
    def side(df, n_terms):
        if n_terms < encode.BROADCAST_DICT_MAX_TERMS:
            return F.broadcast(df)
        return df.hint('shuffle_hash') if shj else df
    return (tri.select('s','p','o')
        .join(side(sd, d.n_shared + d.n_subjects), 's')
        .join(side(pd_, d.n_predicates), 'p')
        .join(side(od, d.n_shared + d.n_objects), 'o')
        .select(F.col('sid').alias('s'), F.col('pid').alias('p'), F.col('oid').alias('o')))

def variant(name):
    shj = 'shj' in name
    enc = joined(shj)
    if 'packed' in name:
        # non-overlapping fields: addition == bitwise-or ('|' is logical
        # OR on Columns)
        v = (F.shiftleft(F.col('s'), bits_p + bits_o)
             + F.shiftleft(F.col('p'), bits_o) + F.col('o'))
        packed = enc.select(v.alias('v'))
        out = (packed.repartitionByRange(n, 'v').dropDuplicates(['v'])
               .sortWithinPartitions('v')
               .select(F.shiftright('v', bits_p + bits_o).alias('s'),
                       (F.shiftright('v', bits_o) % F.lit(1 << bits_p)).alias('p'),
                       (F.col('v') % F.lit(1 << bits_o)).alias('o')))
    else:
        out = (enc.repartitionByRange(n, 's', 'p', 'o')
               .dropDuplicates(['s','p','o']).sortWithinPartitions('s','p','o'))
    t0 = time.monotonic()
    cnt = out.count()
    return round(time.monotonic() - t0, 2), cnt

variant('base')  # warmup
out = {{}}
for name in ('base', 'shj', 'packed', 'shj+packed'):
    w, cnt = variant(name)
    out[name] = w
    out['n_triples'] = cnt
out['cores'] = {cores}
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
    speedups = {k: round(a[k] / b[k], 2) for k in a
                if k not in ("cores", "n_triples")}
    print(json.dumps({"n_conv": n_conv, "runs": [a, b],
                      "speedup": speedups}))


if __name__ == "__main__":
    main()
