import numpy as np, pandas as pd, os
rng = np.random.default_rng(42)
out = "/tmp/folder1scale"
os.makedirs(out, exist_ok=True)
N = 45000
traces = ["1_1","1_2","2_1","2_2","3_1","3_2"]
rows = []
for ti, tr in enumerate(traces):
    t = np.arange(N)
    f0 = 10 + rng.normal(0, 1, N)                       # separating: shifts in ano
    f1 = np.round(rng.normal(5, 2, N))                  # quantized (duplicate runs)
    f2 = np.full(N, 7.0)                                # constant
    f3 = f0*2 + rng.normal(0, .3, N)                    # correlated with f0
    f4 = rng.normal(50, 20, N)                          # noise
    f5 = t/1000.0 + rng.normal(0, .5, N)                # ramp
    f6 = 10*np.sin(t/500.0) + rng.normal(0, 1, N)       # seasonal
    f7 = 20 + rng.normal(0, 2, N)                       # shifts in half the windows
    nw = 5 if tr != "3_2" else 4
    for w in range(nw):
        base = w*9000
        rs, re_, as_, ae = base, base+1900, base+2000, base+3000
        f0[as_:ae+1] += 4                               # mean shift in anomaly
        if w % 2 == 0: f7[as_:ae+1] -= 6
        rows.append((tr, w, rs, re_, as_, ae, {"1":"bursty input","2":"stalled input","3":"CPU contention"}[tr[0]]))
    df = pd.DataFrame({"f0":f0,"f1":f1,"f2":f2,"f3":f3,"f4":f4,"f5":f5,"f6":f6,"f7":f7})
    df.to_csv(f"{out}/{tr}.csv")
lab = pd.DataFrame(rows, columns=["trace_id","ano_id","ref_start","ref_end","ano_start","ano_end","ano_type"])
lab.to_csv(f"{out}/labels.csv")
print("traces:", len(traces), "windows:", len(lab), "rows/trace:", N)
