import duckdb, time
con = duckdb.connect()
con.execute("SET threads TO 8")
con.execute("CREATE VIEW documents AS SELECT * FROM '.testdata/sf1/documents.parquet'")
norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
hashed = f"""list_distinct(list_transform(list_distinct(list_transform(
    range(1, greatest(len(string_split({norm}, ' ')) - 1, 1)),
    i -> string_split({norm}, ' ')[i] || ' ' || string_split({norm}, ' ')[i+1] || ' ' || string_split({norm}, ' ')[i+2])),
    g -> CAST(CAST(concat('0x', substr(md5(g), 1, 8)) AS UBIGINT) AS BIGINT)))"""
t0=time.time()
con.execute(f"""
CREATE TABLE pairs AS
WITH docs_aug AS (
    SELECT doc_id, text, source FROM documents
    UNION ALL SELECT doc_id + 10000000, text, source FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 10)
    UNION ALL SELECT doc_id + 20000000, text, source FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 10)
),
sh AS (SELECT doc_id, source, {hashed} AS sh FROM docs_aug)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.03
""")
print("pairs", con.execute("select count(*) from pairs").fetchone(), round(time.time()-t0,1))
# union-find in python for component stats
import sys
sys.setrecursionlimit(100000)
par={}
def find(x):
    while par.get(x,x)!=x:
        par[x]=par.get(par[x],par[x]); x=par[x]
    return x
def uni(a,b):
    ra,rb=find(a),find(b)
    if ra!=rb: par[ra]=rb
for ida,idb in con.execute("select id_a,id_b from pairs").fetchall():
    par.setdefault(ida,ida); par.setdefault(idb,idb); uni(ida,idb)
from collections import Counter
c=Counter(find(x) for x in list(par))
sizes=Counter(c.values())
print("component size dist (size:count):", dict(sorted(sizes.items())))
print("max component:", max(c.values()))
