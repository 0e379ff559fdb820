import duckdb, time, sys
sys.path.insert(0,'/root/repo')
import __spark_entry__ as e
names = sys.argv[1:]
for name in names:
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '.testdata/sf1/{t}.parquet'")
    t0=time.time()
    try:
        con.execute(f"SET statement_timeout='120s'")
    except Exception: pass
    try:
        r=con.execute(e.oracle_sql()[name]).fetchall()
        print(name, len(r), 'rows', round(time.time()-t0,1),'s', flush=True)
    except Exception as ex:
        print(name, 'ERR', round(time.time()-t0,1), str(ex)[:80], flush=True)
    con.close()
