import sys
sys.path.insert(0, '/root/repo')
from steel_energy_consumption_prediction_using_pyspark_spark.session import get_session
from steel_energy_consumption_prediction_using_pyspark_spark.operators import dedup as D
from steel_energy_consumption_prediction_using_pyspark_spark.workload.text import _with_planted_dups, T
spark = get_session()
d = T(spark, '/root/testdata/sf0.01', 'documents')
aug = _with_planted_dups(_with_planted_dups(d, 10, 10_000_000), 10, 20_000_000)
pairs = D.ngram_jaccard_pairs(aug, 'text', 'doc_id', block_col='source', shingle_n=3, threshold=0.03)
pairs.explain('formatted')
