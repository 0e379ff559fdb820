import duckdb, time, sys
sys.path.insert(0,'/root/repo')
import __spark_entry__ as e
con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM '.testdata/sf1/documents.parquet'")
t0=time.time(); r=con.execute(e.oracle_sql()['winnowing']).fetchall()
print('winnowing oracle sf1:', len(r), 'rows', round(time.time()-t0,1), 's')
