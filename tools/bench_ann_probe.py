"""Probe-only ANN bench: separates index BUILD cost from probe cost.

q79/q80 rebuild their index inside the query (the correctness gate wants
self-contained queries), so bench timings for them measure build+probe.
This tool measures the serving shape instead: build each index ONCE into a
persisted layout (``ensure_ann_index`` / ``ensure_ivf_index`` — warm calls
skip the build entirely), then time a stream of partition-pruned probes.

    python tools/bench_ann_probe.py [sf_dir] [n_probes]

Prints one JSON line:
    {"metric": "ann_probe", "build_srp": s, "build_ivf": s,
     "probe_srp": s/probe, "probe_ivf": s/probe, "n_probes": N, "sf_dir": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gofeed_spark.catalog import load_table
from gofeed_spark.operators import similarity
from gofeed_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ann-probe-bench", master=f"local[{cpus}]")
    emb = load_table(spark, sf_dir, "embeddings")

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_data",
        f"ann_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    srp_path = os.path.join(base, "srp")
    srpq_path = os.path.join(base, "srp_q")
    ivf_path = os.path.join(base, "ivf")

    t0 = time.perf_counter()
    similarity.ensure_ann_index(emb, srp_path, n_planes=6, dim=64)
    build_srp = time.perf_counter() - t0
    similarity.ensure_ann_index(emb, srpq_path, n_planes=6, dim=64, quantize=True)
    t0 = time.perf_counter()
    codebook = similarity.ensure_ivf_index(emb, ivf_path, n_cells=64)
    build_ivf = time.perf_counter() - t0

    # query vectors: a deterministic spread of corpus ids, collected once
    qrows = emb.orderBy("vec_id").limit(n_probes).collect()
    qvecs = [(r.vec_id, list(r.embedding)) for r in qrows]

    # warm-up probe per path (codegen/plan compile), then timed stream
    similarity.probe_ann_index(spark, srp_path, qvecs[0][1], k=5, n_planes=6).collect()
    t0 = time.perf_counter()
    for qid, qv in qvecs:
        similarity.probe_ann_index(
            spark, srp_path, qv, k=5, n_planes=6, exclude_id=qid
        ).collect()
    probe_srp = (time.perf_counter() - t0) / n_probes

    # multiprobe (Hamming radius 2): the recall/scan dial's midpoint — how
    # much the widened partition-pruned read costs over the single bucket
    t0 = time.perf_counter()
    for qid, qv in qvecs:
        similarity.probe_ann_index(
            spark, srp_path, qv, k=5, n_planes=6, exclude_id=qid, multiprobe=2
        ).collect()
    probe_srp_mp2 = (time.perf_counter() - t0) / n_probes

    # int8-quantized layout: same probe, pruned read scans ~1/4 the bytes
    similarity.probe_ann_index(spark, srpq_path, qvecs[0][1], k=5, n_planes=6).collect()
    t0 = time.perf_counter()
    for qid, qv in qvecs:
        similarity.probe_ann_index(
            spark, srpq_path, qv, k=5, n_planes=6, exclude_id=qid
        ).collect()
    probe_srp_q = (time.perf_counter() - t0) / n_probes

    def tree_bytes(root):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(root) for f in fs if f.endswith(".parquet")
        )

    similarity.probe_ivf_index(spark, ivf_path, codebook, qvecs[0][1], k=5).collect()
    t0 = time.perf_counter()
    for qid, qv in qvecs:
        similarity.probe_ivf_index(
            spark, ivf_path, codebook, qv, k=5, n_probe=4, exclude_id=qid
        ).collect()
    probe_ivf = (time.perf_counter() - t0) / n_probes

    # PQ layout: ADC candidate scan reads ONLY the packed-code relation;
    # pq_bytes is that scan payload vs the float layouts above
    pq_path = os.path.join(base, "pq")
    t0 = time.perf_counter()
    similarity.ensure_pq_index(emb, pq_path, n_sub=8, n_cents=64)
    build_pq = time.perf_counter() - t0
    similarity.probe_pq_index(spark, pq_path, qvecs[0][1], k=5).collect()
    t0 = time.perf_counter()
    for qid, qv in qvecs:
        similarity.probe_pq_index(
            spark, pq_path, qv, k=5, refine=40, exclude_id=qid
        ).collect()
    probe_pq = (time.perf_counter() - t0) / n_probes

    print(
        json.dumps(
            {
                "metric": "ann_probe",
                "build_srp": round(build_srp, 3),
                "build_ivf": round(build_ivf, 3),
                "probe_srp": round(probe_srp, 3),
                "probe_srp_mp2": round(probe_srp_mp2, 3),
                "probe_srp_q": round(probe_srp_q, 3),
                "srp_bytes": tree_bytes(srp_path),
                "srp_q_bytes": tree_bytes(srpq_path),
                "probe_ivf": round(probe_ivf, 3),
                "build_pq": round(build_pq, 3),
                "probe_pq": round(probe_pq, 3),
                "pq_codes_bytes": tree_bytes(os.path.join(pq_path, "codes")),
                "n_probes": n_probes,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
