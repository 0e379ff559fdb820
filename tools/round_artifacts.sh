#!/bin/bash
# Regenerate every per-round artifact on the current tree, in order,
# stopping at the first failure. Run from the repo root:
#   bash tools/round_artifacts.sh 2>&1 | tee .scratch/round_artifacts.log
# pipefail is load-bearing: every stage pipes through `tail`, which
# would otherwise swallow the stage's exit code and let set -e sail
# past a failing gate into regenerating artifacts from a broken tree.
set -eo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/10] pytest ==="
python -m pytest tests/ -x -q 2>&1 | tail -2

echo "=== [2/10] sf1 fixture (regenerate if absent) ==="
if [ ! -d .testdata/sf1 ]; then
  python tools/gen_sf.py /root/testdata/sf0.1 .testdata/sf1 10 2
fi

echo "=== [3/10] full gate sf0.001 ==="
CHECK_JSON_OUT=CORRECTNESS_FULL_sf0.001.json \
  python tools/check_correctness.py /root/testdata/sf0.001 2>/dev/null | tail -2

echo "=== [4/10] full gate sf0.01 ==="
CHECK_JSON_OUT=CORRECTNESS_FULL_sf0.01.json \
  python tools/check_correctness.py /root/testdata/sf0.01 2>/dev/null | tail -2

echo "=== [5/10] full gate sf0.1 ==="
CHECK_JSON_OUT=CORRECTNESS_FULL_sf0.1.json \
  python tools/check_correctness.py /root/testdata/sf0.1 2>/dev/null | tail -2

echo "=== [6/10] full gate sf1 ==="
CHECK_JSON_OUT=CORRECTNESS_FULL_sf1.json \
  python tools/check_correctness.py .testdata/sf1 2>/dev/null | tail -2

echo "=== [7/10] bench sf0.01 + sf0.1 + sf1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py 2>/dev/null | tail -1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py 2>/dev/null | tail -1
SPARK_GRAFT_SF_DIR=.testdata/sf1 python bench.py 2>/dev/null | tail -1

echo "=== [8/10] sf10 decade rung: dedup/similarity/text subset ==="
# One more decade for the families whose fixtures sf10 actually grows
# 10x (documents/embeddings; facts only 2x there — VERDICT r6 #5).
# The exact quadratic-by-design tiers (ngram_jaccard,
# containment_pairs, dedup_clusters, cluster_representatives,
# embedding_neardup) are EXCLUDED from this rung on purpose: their
# contract is quadratic-within-block and 100k docs would take hours;
# their volume path IS the minhash/simhash/semantic tier benched here.
if [ ! -d .testdata/sf10 ]; then
  python tools/gen_sf.py .testdata/sf1 .testdata/sf10 2 10
fi
SPARK_GRAFT_SF_DIR=.testdata/sf10 SPARK_GRAFT_BENCH_ONLY=fingerprint_dedup,dedup_exact_survivors,minhash_lsh,simhash,semantic_dedup,signature_store_build,incremental_dedup,knn_bruteforce,ann_lsh,ann_ivf,ivf_probe,ann_pq,pq_probe,ann_recall,embedding_stats,centroids,mmr_rerank,ann_index_build,ivf_probe_materialized,pq_probe_materialized,rag_probe,rag_retrieve,ann_index_update,ann_index_staleness,hard_negatives,ann_quantized,lsh_quality,tfidf,bm25,lang_id,text_quality,text_stats,token_count_bpe,token_histogram,chunk_documents,inverted_index,phrase_search,winnowing,winnow_pairs,dup_passages,unigram_logprob,bigram_lm,pmi_collocations,skipgram_counts,bpe_train,bpe_encode,passage_scrub,pii_scrub,decontaminate,repetition,corpus_curation,prefix_jaccard,dsir_select,temperature_mix,budget_select,weighted_reservoir,pack_windows \
  python bench.py 2>/dev/null | tail -1

echo "=== [9/10] scale ladder (sf0.01 -> sf0.1 -> sf1 -> sf10) ==="
python tools/scale_ladder.py --out SCALE_LADDER_r08.json \
  bench_detail_sf001.json bench_detail.json bench_detail_sf1.json \
  bench_detail_sf10.json | tail -3

echo "=== [10/10] done ==="
