import duckdb, time, sys
sys.path.insert(0,'/root/repo')
import __spark_entry__ as e
name = sys.argv[1]
sql = e.oracle_sql().get(name)
if sql is None:
    print(name, "rows-only"); sys.exit(0)
con = duckdb.connect(); con.execute("SET threads TO 8")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '.testdata/sf1/{t}.parquet'")
t0=time.time(); r=con.execute(sql).fetchall()
print(name, len(r), 'rows', round(time.time()-t0,1),'s')
