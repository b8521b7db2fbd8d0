import sys, time, types, logging
sys.modules['stumpy'] = types.ModuleType('stumpy')  # fp=False never calls stumpy.match
sys.path.insert(0, '/root/reference')
logging.disable(logging.CRITICAL)
import pandas as pd, numpy as np
from exstream.correlation_filtering import correlated_features_filter
from exstream.false_positive_filtering import false_positive_filter
from exstream.entropy_based_single_reward_feature import entropy_based_single_feature_reward, reward_leap_filter
from utils.get_data import get_train_test_data, split_references_and_anomalies

# E2E_DATA overrides the fixture dir (r10: the 12-column folder_1-scale
# run, /tmp/folder1scale_f2); E2E_DUMP writes the main cluster=False
# explanation dict as JSON for the at-scale parity compare
import os
DATA = os.environ.get("E2E_DATA", "/tmp/folder1scale")
LAB, THR, MAXD = "labels", 0.6, 40.0

def compute_explanatory_features(distances):
    return reward_leap_filter(distances) if len(distances) > 1 else list(distances.keys())

def get_explanatory_features(refs, anos, cluster, fp):
    all_data = pd.concat([refs, anos])
    filtered = correlated_features_filter(all_data, correlation_threshold=THR, cluster=cluster)
    filtered = [f if not isinstance(f, list) else f[0] for f in filtered]
    refs = refs.loc[:, filtered]; anos = anos.loc[:, filtered]
    out = {}
    for ano in anos.index.unique():
        ano_data, ano_ref = anos.loc[ano], refs.loc[ano]
        nf = false_positive_filter(ano_ref, refs, fp, max_distance=MAXD)
        ano_data, ano_ref = ano_data.loc[:, nf], ano_ref.loc[:, nf]
        ano_all = pd.concat([ano_ref, ano_data], axis=0)
        out[ano] = compute_explanatory_features(entropy_based_single_feature_reward(ano_ref, ano_data, ano_all))
    return out

t_load0 = time.time()
refs, anos = split_references_and_anomalies(DATA, LAB)
_, labels = get_train_test_data(DATA, LAB)
t_load = time.time() - t_load0
print(f"load: {t_load:.1f}s  refs={len(refs)} anos={len(anos)}")

for cluster in (False, True):
    t0 = time.time()
    exp = get_explanatory_features(refs, anos, cluster, False)
    for i in range(5):  # instability resamples (script_1.py:227-241)
        sr, sa = refs.sample(frac=0.8), anos.sample(frac=0.8)
        get_explanatory_features(sr, sa, cluster, False)
    print(f"cluster={cluster} fp=False: {time.time()-t0:.1f}s  ({len(exp)} windows)")
    if not cluster and os.environ.get("E2E_DUMP"):
        import json
        with open(os.environ["E2E_DUMP"], "w") as f:
            json.dump({k: list(v) for k, v in exp.items()}, f, indent=1, sort_keys=True)
