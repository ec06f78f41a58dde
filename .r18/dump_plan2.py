"""Plan dump with localCheckpoint disabled (fixture queries checkpoint their
output, which would truncate the interesting plan)."""
import sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.classic.dataframe as _cd
_cd.DataFrame.localCheckpoint = lambda self, eager=True: self
from gofeed_spark.session import get_spark
from gofeed_spark.queries import QUERIES
import re

tag, sf_dir = sys.argv[1], sys.argv[2]
spark = get_spark("plans2")
for name in sys.argv[3:]:
    df = QUERIES[name](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    out = f"/root/repo/plans/r18/{name}_{tag}.txt"
    open(out, "w").write(txt)
    nex = len(re.findall(r"\bExchange\b", txt))
    print(f"{name} {tag}: Exchange={nex} len={len(txt)}")
