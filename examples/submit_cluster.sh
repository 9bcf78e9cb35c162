#!/usr/bin/env bash
# Cluster submission template for the engine's jobs — the conf set a
# 1000-executor / 100 TB deployment starts from. Every knob here is
# the cluster analog of something session.py already sets for
# local[32]; the comments say which queries each knob exists for.
#
#   ./examples/submit_cluster.sh examples/jobs.yml data-cleaning
#
set -euo pipefail
JOB_YML="${1:-examples/jobs.yml}"
JOB="${2:-data-cleaning}"

spark-submit \
  --deploy-mode cluster \
  --num-executors 1000 \
  --executor-cores 5 \
  --executor-memory 24g \
  --conf spark.executor.memoryOverhead=6g \
  `# Arrow-batched pandas-UDF kernels (similarity/multimodal) run in` \
  `# the Python worker: budget it explicitly or YARN/K8s kills pods` \
  --conf spark.executor.pyspark.memory=4g \
  \
  `# AQE owns runtime re-planning: coalescing post-shuffle partitions,` \
  `# skew-join splitting, and broadcast demotion. One deliberate` \
  `# exception is pinned in-code: the bigram-LM scoring join forces` \
  `# shuffled-hash (lm_perplexity_filter) after AQE's compressed-size` \
  `# estimate deserialized a 5 GiB broadcast at the sf10 probe.` \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  \
  `# ~3x total cores so AQE has partitions to coalesce; at 100 TB the` \
  `# per-partition target is set by maxPartitionBytes on the scan side` \
  --conf spark.sql.shuffle.partitions=15000 \
  --conf spark.sql.files.maxPartitionBytes=256m \
  \
  `# pair operators (minhash bands, posting joins, GEMM buckets)` \
  `# shuffle 8-byte keys by design — keep the transport cheap` \
  --conf spark.shuffle.compress=true \
  --conf spark.io.compression.codec=zstd \
  --conf spark.serializer=org.apache.spark.serializer.KryoSerializer \
  \
  `# iterative operators (connected components, pagerank) MUST get a` \
  `# fault-tolerant checkpoint dir on a real cluster: pass it through` \
  `# to their checkpoint_dir parameter (localCheckpoint loses blocks` \
  `# with lost executors — see operators/graph.py docstring)` \
  --conf spark.checkpoint.dir=hdfs:///tmp/cps_checkpoints \
  \
  `# Arrow transfer for the pandas-UDF kernels and createDataFrame` \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=10000 \
  \
  `# event-time sessions pin UTC so timestamp semantics match the` \
  `# engine's oracle conventions (session.py does this locally)` \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.parquet.int96RebaseModeInRead=CORRECTED \
  \
  `# dynamic allocation for the long-tail stages of curation sweeps` \
  --conf spark.dynamicAllocation.enabled=true \
  --conf spark.dynamicAllocation.shuffleTracking.enabled=true \
  --conf spark.dynamicAllocation.maxExecutors=1000 \
  \
  --py-files classification_pyspark_spark.zip \
  classification_pyspark_spark/plans/cli.py run -c "$JOB_YML" -j "$JOB"
