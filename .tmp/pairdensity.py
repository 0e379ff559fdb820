import duckdb, time
con = duckdb.connect()
con.execute("SET threads TO 8")
con.execute("CREATE VIEW documents AS SELECT * FROM '.testdata/sf1/documents.parquet'")
norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
t0=time.time()
n = con.execute(f"""
WITH sh AS (
    SELECT doc_id, source,
           list_distinct(
               list_transform(
                   range(1, greatest(len(string_split({norm}, ' ')) - 1, 1)),
                   i -> string_split({norm}, ' ')[i] || ' ' ||
                        string_split({norm}, ' ')[i+1] || ' ' ||
                        string_split({norm}, ' ')[i+2]
               )
           ) AS sh
    FROM documents
)
SELECT count(*) FROM sh a JOIN sh b ON a.source=b.source AND a.doc_id<b.doc_id
WHERE len(list_intersect(a.sh,b.sh)) / CAST(len(list_distinct(list_concat(a.sh,b.sh))) AS DOUBLE) >= 0.03
""").fetchone()
print("pairs:", n, "elapsed", round(time.time()-t0,1))
