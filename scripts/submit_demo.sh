#!/usr/bin/env bash
# End-to-end spark-submit --py-files run (the north-rule deployment
# shape): package the engine as a zip, submit the index-build + query
# job at two parallelism levels over the SAME staged corpus, and print
# the throughput at both plus scaling efficiency.
#
# On a real cluster, replace --master with your YARN/k8s master and the
# parallelism pair with executor counts (N and 4N executors).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${LSS_SUBMIT_WORK:-$(mktemp -d /tmp/lss_submit.XXXX)}"
TURNS="${LSS_SUBMIT_TURNS:-50000}"
N_CORES="${LSS_SUBMIT_N:-2}"
SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

echo ">> packaging engine -> $WORK/lucene_solr_spark.zip"
(cd "$REPO" && python -m zipfile -c "$WORK/lucene_solr_spark.zip" lucene_solr_spark)

echo ">> staging deterministic corpus ($TURNS turns) -> $WORK/corpus"
python - "$WORK/corpus" "$TURNS" <<'EOF'
import sys
from lucene_solr_spark.session import get_spark
from lucene_solr_spark.sources.synth import synth_transcripts
spark = get_spark("stage_corpus", cores=8, shuffle_partitions=8)
synth_transcripts(spark, int(sys.argv[2])).write.mode("overwrite").parquet(sys.argv[1])
spark.stop()
EOF

QUERY_TERMS="$(python -c 'from lucene_solr_spark.sources.synth import synth_term; print(",".join(synth_term(r) for r in (1, 50, 300)))')"

run() {
  local cores="$1" tag="$2"
  echo ">> spark-submit --master local[$cores] --py-files ... index_job.py"
  "$SPARK_SUBMIT" \
    --master "local[$cores]" \
    --conf spark.sql.shuffle.partitions="$cores" \
    --conf spark.ui.enabled=false \
    --conf spark.ui.showConsoleProgress=false \
    --py-files "$WORK/lucene_solr_spark.zip" \
    "$REPO/scripts/index_job.py" \
    --input "$WORK/corpus" --index "$WORK/index_$tag" \
    --segments 64 --query "$QUERY_TERMS" --mode disjunctive --k 10 \
    2>"$WORK/submit_$tag.log" | tee "$WORK/result_$tag.json"
}

run "$N_CORES" n
run "$((4 * N_CORES))" 4n

python - "$WORK/result_n.json" "$WORK/result_4n.json" <<'EOF'
import json, sys
n = json.load(open(sys.argv[1]))
n4 = json.load(open(sys.argv[2]))
eff = (n4["turns_per_sec"] / n["turns_per_sec"]) / 4
print(f"turns/sec @N={n['parallelism']}:  {n['turns_per_sec']}")
print(f"turns/sec @4N={n4['parallelism']}: {n4['turns_per_sec']}")
print(f"scaling efficiency (N->4N): {eff:.3f}")
print("note: at this demo corpus size Spark's fixed per-job latency "
      "dominates; the recorded >=0.8 measurement uses 1.6M turns "
      "(python bench.py --scaling, see BENCH.md)")
EOF
