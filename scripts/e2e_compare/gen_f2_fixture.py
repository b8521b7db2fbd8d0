#!/usr/bin/env python3
"""Generate the 12-column dynamic-schema trace fixture (traces_f2) and
print REFERENCE-implementation golden explanations for it.

The 12 metric column names are the regenerated-folder_1 wide schema of
`/root/reference/explore_data.ipynb` cell 9 (the reference's own data
evolved from 8 to 12 columns under the same pipeline — exactly the
schema drift the engine's dynamic melt has to absorb). Behavioral roles
mirror the folder_1 unit fixture (FIXTURES.md A1): one separating
feature, a correlated twin, a tied/quantized feature, a constant, noise
columns, plus a second separating feature and a second correlated pair
among the "extra" columns so the wider schema changes the answer, not
just the shape.

Writes src/test/resources/traces_f2/{1_1.csv,2_1.csv,labels.csv}, then
runs the committed reference implementation (stumpy stubbed; the
correlation filter's nested-list append flattened — the same two
accommodations scripts/e2e_compare/ref_driver.py documents) for
cluster in {False, True} and prints the per-window explanations to pin
in PipelineF2Spec.
"""
import sys, types, logging, os
import numpy as np, pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "..", "src", "test", "resources", "traces_f2")

COLS = [
    "driver_StreamingMetrics_streaming_lastCompletedBatch_processingDelay_value",
    "driver_StreamingMetrics_streaming_lastCompletedBatch_schedulingDelay_value",
    "driver_StreamingMetrics_streaming_lastReceivedBatch_records_value",
    "driver_BlockManager_memory_memUsed_MB_value",
    "driver_jvm_heap_used_value",
    "driver_StreamingMetrics_streaming_totalCompletedBatches_value_1_diff",
    "avg_jvm_heap_used_value",
    "avg_executor_filesystem_hdfs_write_ops_value_1_diff",
    "avg_executor_cpuTime_count_1_diff",
    "avg_executor_runTime_count_1_diff",
    "avg_executor_shuffleRecordsRead_count_1_diff",
    "avg_executor_shuffleRecordsWritten_count_1_diff",
]

LABELS = [
    ("1_1", 0, 0, 100, 200, 250, "bursty input"),
    ("1_1", 1, 100, 180, 210, 240, "bursty input"),
    ("2_1", 0, 0, 100, 200, 250, "stalled input"),
    ("2_1", 1, 50, 150, 220, 245, "stalled input"),
]

def gen():
    os.makedirs(OUT, exist_ok=True)
    N = 300
    for tr, seed in (("1_1", 7), ("2_1", 8)):
        rng = np.random.default_rng(seed)
        t = np.arange(N)
        sep = 10 + rng.normal(0, 1, N)          # separating: +4 in ano spans
        corr = 2 * sep + rng.normal(0, 0.1, N)  # its >0.99-correlated twin
        tied = np.round(rng.normal(5, 2, N))    # quantized duplicates
        const = np.full(N, 7.0)
        noise1 = rng.normal(50, 20, N)
        repeat = 5 * np.sin(t / 6.0) + rng.normal(0, 0.2, N)
        noise2 = rng.normal(30, 5, N)
        ramp = t / 100.0 + rng.normal(0, 0.3, N)
        noise3 = rng.normal(0, 1, N)
        corr2 = 1.5 * noise1 + rng.normal(0, 1, N)  # second correlated pair
        sep2 = 20 + rng.normal(0, 1, N)         # second separating feature
        noise4 = rng.normal(100, 10, N)
        for (tid, _aid, rs, re_, as_, ae, _ty) in LABELS:
            if tid != tr:
                continue
            sep[as_:ae + 1] += 4
            sep2[as_:ae + 1] -= 3
        df = pd.DataFrame(dict(zip(COLS, [
            sep, corr, tied, const, noise1, repeat,
            noise2, ramp, noise3, corr2, sep2, noise4])))
        df.to_csv(os.path.join(OUT, f"{tr}.csv"))
    lab = pd.DataFrame(LABELS, columns=[
        "trace_id", "ano_id", "ref_start", "ref_end",
        "ano_start", "ano_end", "ano_type"])
    lab.to_csv(os.path.join(OUT, "labels.csv"))
    print(f"wrote {OUT}: 2 traces x 300 rows x {len(COLS)} cols, {len(LABELS)} windows")

def reference_goldens():
    sys.modules['stumpy'] = types.ModuleType('stumpy')
    sys.path.insert(0, '/root/reference')
    logging.disable(logging.CRITICAL)
    from exstream.correlation_filtering import correlated_features_filter
    from exstream.false_positive_filtering import false_positive_filter
    from exstream.entropy_based_single_reward_feature import (
        entropy_based_single_feature_reward, reward_leap_filter)
    from utils.get_data import split_references_and_anomalies

    refs, anos = split_references_and_anomalies(OUT, "labels")
    for cluster in (False, True):
        all_data = pd.concat([refs, anos])
        if cluster:
            # The committed Step 4 is `cluster.pop()` from a SET — string
            # hash order, nondeterministic ACROSS PROCESSES (SURVEY §4a):
            # two runs of the reference can keep different representatives.
            # For a pinnable golden, run the reference's own graph
            # construction (steps 1-3 verbatim) and make step 4
            # deterministic the way the engine documents: the
            # minimum-feature-order-index member represents its cluster.
            import networkx as nx
            metrics = list(all_data.columns[:-4])
            cm = all_data.corr()
            G = nx.Graph(); G.add_nodes_from(metrics)
            for i in range(len(metrics)):
                for j in range(i):
                    if abs(cm.iloc[i, j]) > 0.6:
                        G.add_edge(cm.columns[i], cm.columns[j])
            idx = {f: k for k, f in enumerate(metrics)}
            filtered = [min(c, key=idx.get) for c in nx.connected_components(G)]
            filtered.append("type_data")
        else:
            filtered = correlated_features_filter(all_data, correlation_threshold=0.6,
                                                  cluster=cluster)
            filtered = [f if not isinstance(f, list) else f[0] for f in filtered]
        r = refs.loc[:, filtered]
        a = anos.loc[:, filtered]
        print(f"-- cluster={cluster}")
        for ano in a.index.unique():
            ano_data, ano_ref = a.loc[ano], r.loc[ano]
            nf = false_positive_filter(ano_ref, r, False, max_distance=40.0)
            d = entropy_based_single_feature_reward(
                ano_ref.loc[:, nf], ano_data.loc[:, nf],
                pd.concat([ano_ref.loc[:, nf], ano_data.loc[:, nf]], axis=0))
            exp = reward_leap_filter(d) if len(d) > 1 else list(d.keys())
            print(f"  {ano}: {exp}")

if __name__ == "__main__":
    gen()
    reference_goldens()
