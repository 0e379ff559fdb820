import duckdb, time, sys
sys.path.insert(0,'/root/repo')
import __spark_entry__ as e
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '.testdata/sf1/{t}.parquet'")
t0=time.time(); r=con.execute(e.oracle_sql()['pii_scrub']).fetchall()
print('pii_scrub oracle sf1:', len(r), 'rows', round(time.time()-t0,1), 's')
