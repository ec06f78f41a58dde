"""Dump .explain('formatted') for named queries to plans/r18/<q>_<tag>.txt"""
import sys

sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.queries import QUERIES

tag = sys.argv[1]
sf_dir = sys.argv[2]
names = sys.argv[3:]
spark = get_spark("plans")
for name in names:
    df = QUERIES[name](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out = f"/root/repo/plans/r18/{name}_{tag}.txt"
    with open(out, "w") as f:
        f.write(txt)
    import re

    nex = len(re.findall(r"\bExchange\b", txt))
    bhj = len(re.findall(r"\bBroadcastHashJoin\b", txt))
    smj = len(re.findall(r"\bSortMergeJoin\b", txt))
    imr = len(re.findall(r"\bInMemoryRelation\b", txt))
    print(f"{name} {tag}: Exchange={nex} BHJ={bhj} SMJ={smj} InMemoryRelation={imr} -> {out}")
