import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
from inspig_etl_spark.session import get_spark
spark = get_spark("ab", master="local[4]")
spark.sparkContext.setLogLevel("ERROR")
from inspig_etl_spark import queries as reg
reg._load()
SF="/root/testdata/sf0.01"
sc=spark.sparkContext
def jid():
    v=sc._jsc.sc().dagScheduler().nextJobId()
    return v if isinstance(v,int) else v.get()
for name,q in reg.REGISTRY.items():
    j0=jid()
    try:
        df=q.fn(spark,SF); df.schema
    except Exception as e:
        print(f"{name}: BUILD ERROR {e}"); continue
    j1=jid()
    if j1>j0: print(f"{name}: {j1-j0} build jobs")
    spark.catalog.clearCache()
print("DONE")
