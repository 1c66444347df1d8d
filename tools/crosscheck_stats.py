#!/usr/bin/env python3
"""Independent (numpy, not DuckDB) cross-check of the statistical operators.

The driver's oracle gate and the Spark side share the same closed-form
formulas, so a formula-level bug would pass both. This script recomputes
KS (q170), Mann-Whitney U (q171), Gini (q172) and Kaplan-Meier (q158)
from raw parquet with INDEPENDENT numpy algorithms (searchsorted ECDFs,
mergesort midranks, explicit survival product, broadcast pairwise slopes,
polyfit, corrcoef, argmax scans) and compares against the graft.Verify
dumps. Round 7 adds Theil-Sen (q182), OLS+R2 (q187), the correlation
matrix (q192), the changepoint locator (q181), the savgol interp edge
fits (q210, via lstsq) and the KNN imputation (q209, brute-force
neighbor means). Round 8 adds ROC AUC (q237, explicit O(n_pos*n_neg)
pairwise wins — not the rank identity the engines share), PageRank
(q233, dense numpy power iteration vs the join formulation),
split-conformal coverage (q234), rolling pair correlation (q240, pandas
rolling.corr), the Pareto frontier (q239, brute-force O(n^2)
dominance), Allan variance (q249, explicit bucket-mean diffs), Gumbel
return levels (q251, block-maxima moments), the periodogram (q252,
centered cos/sin projection) and the triangle census (q246, dense
adjacency A^3 trace — a wholly different algorithm from the wedge
join).

Round 9 adds Spearman (q273, scipy-free average-rank + corrcoef),
Kruskal-Wallis (q274, dense pooled ranks), Mann-Kendall (q275, the
explicit O(n^2) sign double loop), Jarque-Bera (q277, numpy central
moments), one-way ANOVA + Brown-Forsythe (q278/q279, textbook SS
decomposition over per-group arrays) and Yule-Walker AR(2) (q280,
dense gap-masked lagged-vector products), Wasserstein-1 (q289, searchsorted
ECDF area) and CUPED (q290, dense covariate adjustment with hashlib arms).

Round 10 adds the k-core peel (q323, plain-python set loop), banded DTW
(q324, full-matrix numpy DP vs the two-row banded scan) and Lloyd k-means
(q326, full numpy trajectory replay) — and fixes a silent-skip bug: the
q301 block rebound `out` (the verify dir) to a list, so every dump() after
it returned None and q280's check had stopped running without failing.

Usage: python3 tools/crosscheck_stats.py [sf_dir] [verify_out_dir]
Last verified 2026-08-16 (r10): all thirty-two match to 6 decimals at sf0.01.
"""
import sys, glob
import duckdb
import numpy as np
import pandas as pd


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")

    def dump(name):
        f = glob.glob(f"{out}/{name}/*.parquet")
        return pd.read_parquet(f[0]) if f else None

    ok = True

    # --- KS (q170) ---
    a = np.array(con.execute("SELECT CAST(value AS DOUBLE) v FROM events "
                             "WHERE ts < TIMESTAMP '2024-01-16'").df()['v'])
    b = np.array(con.execute("SELECT CAST(value AS DOUBLE) v FROM events "
                             "WHERE ts >= TIMESTAMP '2024-01-16'").df()['v'])
    allv = np.sort(np.unique(np.concatenate([a, b])))
    D = np.max(np.abs(np.searchsorted(np.sort(a), allv, 'right') / len(a)
                      - np.searchsorted(np.sort(b), allv, 'right') / len(b)))
    ks = dump("q170_ks_test")
    if ks is not None:
        good = abs(ks.ks_d.iloc[0] - D) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q170 KS: numpy {D:.6f} vs {ks.ks_d.iloc[0]}")

    # --- Mann-Whitney U (q171) ---
    pooled = np.concatenate([a, b])
    order = np.argsort(pooled, kind='mergesort')
    ranks = np.empty(len(pooled))
    sv = pooled[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j + 2) / 2.0
        i = j + 1
    n1, n2 = len(a), len(b)
    U = ranks[:n1].sum() - n1 * (n1 + 1) / 2
    tc = np.unique(sv, return_counts=True)[1].astype(float)
    sigma = np.sqrt(n1 * n2 / 12.0 * ((n1 + n2 + 1)
                    - np.sum(tc ** 3 - tc) / ((n1 + n2) * (n1 + n2 - 1))))
    z = (U - n1 * n2 / 2.0) / sigma
    mw = dump("q171_mann_whitney")
    if mw is not None:
        good = abs(mw.u.iloc[0] - U) < 1e-3 and abs(mw.z.iloc[0] - z) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q171 MWU: numpy U={U} z={z:.6f} "
              f"vs U={mw.u.iloc[0]} z={mw.z.iloc[0]}")

    # --- Gini (q172) ---
    x = np.sort(np.array(con.execute(
        "SELECT count(*) c FROM events GROUP BY user_id").df()['c'], dtype=float))
    n = len(x)
    gini = 2 * np.sum(np.arange(1, n + 1) * x) / (n * np.sum(x)) - (n + 1) / n
    g = dump("q172_gini_activity")
    if g is not None:
        good = abs(g.gini.iloc[0] - gini) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q172 Gini: numpy {gini:.6f} vs {g.gini.iloc[0]}")

    # --- Kaplan-Meier (q158) ---
    pu = con.execute("""SELECT user_id,
        min(CASE WHEN event_type='signup' THEN CAST(ts AS DATE) END) AS d0,
        min(CASE WHEN event_type='purchase' THEN CAST(ts AS DATE) END) AS d1,
        max(CAST(ts AS DATE)) AS dmax FROM events GROUP BY user_id""").df()
    pu = pu[pu.d0.notna()]
    dend = pu.dmax.max()
    obs = (pu.d1.notna()) & (pu.d1 >= pu.d0)
    t = np.where(obs, (pu.d1 - pu.d0).dt.days, (dend - pu.d0).dt.days)
    S, rows = 1.0, []
    for tt in sorted(set(t)):
        d = int(np.sum((t == tt) & obs))
        if d > 0:
            S *= 1 - d / int(np.sum(t >= tt))
            rows.append((int(tt), int(np.sum(t >= tt)), d, S))
    km = dump("q158_kaplan_meier")
    if km is not None:
        mine = [tuple(r) for r in km.sort_values('t_days')[
            ['t_days', 'n_at_risk', 'n_events', 'survival']].itertuples(index=False)]
        good = len(rows) == len(mine) and all(
            a[0] == b[0] and a[1] == b[1] and a[2] == b[2] and abs(a[3] - b[3]) < 2e-6
            for a, b in zip(rows, mine))
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q158 KM: {len(rows)} curve points compared")

    # --- hourly series shared by the r7 trend checks ---
    hourly = con.execute("""SELECT event_type, date_trunc('hour', ts) AS h,
        avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2
        ORDER BY event_type, h""").df()

    # --- Theil-Sen (q182): numpy broadcasting over ALL pairs ---
    ts_dump = dump("q182_theil_sen")
    if ts_dump is not None:
        good = True
        for et, grp in hourly.groupby("event_type"):
            t = grp.h.values.astype("datetime64[us]").astype(np.int64) / 3.6e9
            y = grp.y.values
            dt = t[None, :] - t[:, None]
            dy = y[None, :] - y[:, None]
            iu = np.triu_indices(len(t), k=1)
            slope = np.median(dy[iu] / dt[iu])
            icept = np.median(y - slope * t)
            row = ts_dump[ts_dump.event_type == et].iloc[0]
            good &= abs(row.slope_per_hour - slope) < 2e-6
            good &= abs(row.intercept - icept) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q182 Theil-Sen: "
              f"{hourly.event_type.nunique()} series, full pair set")

    # --- OLS (q187): numpy.polyfit per series (t centered on series start) ---
    ols = dump("q187_ols_trend")
    if ols is not None:
        good = True
        for et, grp in hourly.groupby("event_type"):
            t = grp.h.values.astype("datetime64[us]").astype(np.int64) / 3.6e9
            t = t - t.min()
            y = grp.y.values
            sl, ic = np.polyfit(t, y, 1)
            r2 = np.corrcoef(t, y)[0, 1] ** 2
            row = ols[ols.event_type == et].iloc[0]
            good &= abs(row.slope_per_hour - sl) < 2e-6
            good &= abs(row.intercept - ic) < 2e-6
            good &= abs(row.r2 - r2) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q187 OLS: polyfit + corrcoef^2 per series")

    # --- Correlation matrix (q192): numpy.corrcoef on the aligned wide frame ---
    cm = dump("q192_corr_matrix")
    if cm is not None:
        wide = hourly.pivot(index="h", columns="event_type", values="y")
        good = True
        for _, row in cm.iterrows():
            pair = wide[[row.series_a, row.series_b]].dropna()
            good &= int(row.n_hours) == len(pair)
            good &= abs(row["corr"] - np.corrcoef(pair.iloc[:, 0], pair.iloc[:, 1])[0, 1]) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q192 corr matrix: {len(cm)} pairs vs corrcoef")

    # --- Changepoint (q181): explicit argmax scan per series ---
    cp = dump("q181_changepoint")
    if cp is not None:
        good = True
        for et, grp in hourly.groupby("event_type"):
            y = grp.y.values
            n = len(y)
            cums = np.cumsum(y)
            k = np.arange(1, n)
            stat = np.abs(cums[:-1] / k - (cums[-1] - cums[:-1]) / (n - k)) \
                * np.sqrt(k * (n - k) / n)
            best = int(np.argmax(np.round(stat * 1e6) / 1e6))  # rounded-rank tiebreak: earliest h
            row = cp[cp.event_type == et].iloc[0]
            good &= int(row.n_left) == best + 1
            good &= abs(row.shift_stat - stat[best]) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q181 changepoint: argmax scan per series")

    # --- ffilled aligned hourly series, shared by q210 and q209 ---
    srs = con.execute("""
            WITH grid AS (SELECT unnest(generate_series(
                (SELECT date_trunc('hour', min(ts)) FROM events),
                (SELECT date_trunc('hour', max(ts)) FROM events),
                INTERVAL 1 HOUR)) AS ts),
            types AS (SELECT DISTINCT event_type FROM events),
            hourly AS (SELECT date_trunc('hour', ts) AS ts, event_type,
                avg(CAST(value AS DOUBLE)) AS v FROM events GROUP BY 1, 2),
            aligned AS (SELECT g.ts, t.event_type, h.v
                FROM grid g CROSS JOIN types t
                LEFT JOIN hourly h ON h.ts = g.ts AND h.event_type = t.event_type)
            SELECT ts, event_type, last_value(v IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
            FROM aligned ORDER BY event_type, ts""").df()

    # --- Savgol mode='interp' (q210): lstsq edge fits per series ---
    sg = dump("q210_savgol_interp")
    if sg is not None:
        X = np.vander(np.arange(11.0), 4, increasing=True)
        good = True
        for et, grp in srs.groupby("event_type"):
            y = grp.v.values
            mine = sg[sg.event_type == et].sort_values("ts").v_smooth.values
            for i in range(5):
                ch, _, _, _ = np.linalg.lstsq(X, y[:11], rcond=None)
                ct, _, _, _ = np.linalg.lstsq(X, y[-11:], rcond=None)
                good &= abs(mine[i] - np.polyval(ch[::-1], i)) < 2e-6
                good &= abs(mine[-1 - i] - np.polyval(ct[::-1], 10 - i)) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q210 savgol interp: "
              f"lstsq edge fits per series")

    # --- KNN imputation (q209): brute-force neighbor means over the same
    # ffilled aligned wide matrix the query consumes ---
    knn = dump("q209_knn_impute")
    if knn is not None:
        wide = (srs.pivot(index="ts", columns="event_type", values="v")
                .dropna().reset_index().rename(columns={"ts": "h"}))
        import hashlib
        hrs = (wide.h.values.astype("datetime64[us]").astype(np.int64)
               // 3_600_000_000)
        drop = np.array([int(hashlib.md5(str(h).encode()).hexdigest()[0], 16) < 2
                         for h in hrs])
        F = wide[["error", "purchase", "signup", "view"]].values
        tgt = wide.click.values
        good = True
        for mi in np.where(drop)[0]:
            d = np.sqrt(((F[~drop] - F[mi]) ** 2).sum(axis=1))
            # rounded-distance rank with hour tiebreak, like both engines
            dr = np.floor(d * 1e6 + 0.500618034) / 1e6
            order = np.lexsort((hrs[~drop], dr))[:5]
            want = tgt[~drop][order].mean()
            got = knn[knn.h == wide.h.values[mi]].click.iloc[0]
            good &= abs(got - want) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q209 KNN impute: "
              f"{int(drop.sum())} planted cells, brute-force neighbors")

    # --- shared helpers for the r8 checks ---
    def r6(x):
        return np.floor(np.asarray(x, dtype=float) * 1e6 + 0.500618034) / 1e6

    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    import re
    STOP = {"a", "the", "and", "of", "in", "to"}

    def doc_features(text):
        t = re.split(r"\s+", text.strip())
        n = len(t)
        ratio = sum(1 for w in t if w in STOP) / n
        q = min(1.0, n / 200.0) * (1.0 - ratio)
        tf = max(t.count(w) for w in set(t)) / n
        dg = 0.0 if n <= 1 else 1.0 - len({(t[i], t[i + 1]) for i in range(n - 1)}) / (n - 1)
        keep = int(r6(tf) <= 0.2 and r6(dg) <= 0.3)
        return q, keep

    # --- ROC AUC (q237): explicit pairwise wins + half-ties, NOT the rank
    # identity both engines share ---
    auc_d = dump("q237_quality_auc")
    if auc_d is not None:
        docs = con.execute("SELECT text FROM documents").df()
        feats = [doc_features(x) for x in docs.text]
        s = r6([q for q, _ in feats])
        y = np.array([k for _, k in feats])
        sp, sn = s[y == 1], s[y == 0]
        wins = (sp[:, None] > sn[None, :]).sum() + 0.5 * (sp[:, None] == sn[None, :]).sum()
        auc = wins / (len(sp) * len(sn))
        good = (int(auc_d.n_pos.iloc[0]) == len(sp)
                and int(auc_d.n_neg.iloc[0]) == len(sn)
                and abs(auc_d.auc.iloc[0] - auc) < 2e-6)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q237 AUC: pairwise {auc:.6f} "
              f"({len(sp)}x{len(sn)} comparisons) vs {auc_d.auc.iloc[0]}")

    # --- PageRank (q233): dense numpy power iteration over the aggregated
    # trade edges — matrices, not joins ---
    pr = dump("q233_trade_pagerank")
    if pr is not None:
        for t in ["lineitem", "orders", "customer", "supplier", "nation"]:
            con.execute(f"CREATE VIEW IF NOT EXISTS {t} AS SELECT * FROM "
                        f"read_parquet('{sf}/{t}.parquet')")
        edges = con.execute("""
            SELECT cn.n_name AS src, sn.n_name AS dst, sum(l_extendedprice) AS w
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            GROUP BY 1, 2""").df()
        names = sorted(set(edges.src) | set(edges.dst))
        idx = {nm: i for i, nm in enumerate(names)}
        N = len(names)
        W = np.zeros((N, N))
        for _, e in edges.iterrows():
            W[idx[e.src], idx[e.dst]] = e.w
        rowsum = W.sum(axis=1)
        P = np.divide(W, rowsum[:, None], out=np.zeros_like(W),
                      where=rowsum[:, None] > 0)
        r, d = np.full(N, 1.0 / N), 0.85
        for _ in range(5):
            dm = r[rowsum == 0].sum()
            r = (1 - d) / N + d * (P.T @ r + dm / N)
        mine = dict(zip(pr.node, pr["rank"]))
        good = (abs(sum(mine.values()) - 1.0) < 1e-4 and
                all(abs(mine[nm] - r[idx[nm]]) < 2e-6 for nm in names))
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q233 PageRank: dense power "
              f"iteration over {N} nodes, {len(edges)} edges")

    # --- Split-conformal (q234): per-series numpy replay of the
    # calibrate/test protocol on the aligned (non-ffilled) grid ---
    cf = dump("q234_conformal_coverage")
    if cf is not None:
        # the query consumes WindowQ.series = the FFILLED aligned grid
        # (srs above), non-null only (i.e. after each series' first obs)
        al = srs[srs.v.notna()]
        good = True
        for et, grp in al.groupby("event_type"):
            v = grp.v.values
            res = np.abs(v[24:] - v[:-24])
            ab = r6(res)
            n = len(ab)
            ncal = n // 2
            cal, test = ab[:ncal], ab[ncal:]
            order = np.lexsort((np.arange(ncal), cal))  # ties: earlier ts
            k = min(int(np.ceil(0.9 * (ncal + 1))), ncal)
            qhat = cal[order[k - 1]]
            cov = r6((test <= qhat).mean())
            row = cf[cf.event_type == et].iloc[0]
            good &= (int(row.n_cal) == ncal and int(row.n_test) == n - ncal
                     and abs(row.q_hat - qhat) < 1e-12
                     and abs(row.coverage - cov) < 1e-12)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q234 conformal: numpy replay "
              f"per series (q_hat + coverage)")

    # --- Rolling pair correlation (q240): pandas rolling(24).corr ---
    rc = dump("q240_rolling_corr")
    if rc is not None:
        wide = hourly.pivot(index="h", columns="event_type", values="y")
        good = True
        for _, row in rc.iterrows():
            pair = wide[[row.series_a, row.series_b]].dropna()
            r = pair.iloc[:, 0].rolling(24).corr(pair.iloc[:, 1]).dropna()
            r = r[np.isfinite(r)]
            good &= int(row.n_windows) == len(r)
            good &= abs(row.mean_r - r.mean()) < 2e-6
            good &= abs(row.min_r - r.min()) < 2e-6
            good &= abs(row.max_r - r.max()) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q240 rolling corr: "
              f"{len(rc)} pairs vs pandas rolling.corr")

    # --- Pareto frontier (q239): brute-force O(n^2) dominance ---
    pf = dump("q239_pareto_frontier")
    if pf is not None:
        docs = con.execute("SELECT doc_id, source, text FROM documents").df()
        feats = [doc_features(x) for x in docs.text]
        docs["nt"] = [len(re.split(r"\s+", x.strip())) for x in docs.text]
        docs["q"] = r6([q for q, _ in feats])
        want = set()
        for src, grp in docs.groupby("source"):
            X = grp[["nt", "q"]].values
            for i, (xi, yi) in enumerate(X):
                dominated = any((xj >= xi and yj >= yi and (xj > xi or yj > yi))
                                for j, (xj, yj) in enumerate(X) if j != i)
                if not dominated:
                    want.add(int(grp.doc_id.values[i]))
        got = set(pf.doc_id.astype(int))
        good = got == want
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q239 frontier: brute-force "
              f"dominance, {len(want)} frontier docs")

    # --- Allan variance (q249): explicit bucket means + adjacent diffs ---
    av = dump("q249_allan_variance")
    if av is not None:
        raw = con.execute(
            "SELECT event_type s, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) e, "
            "CAST(value AS DOUBLE) v FROM events").df()
        good = True
        for tau in (1, 4, 24):
            raw["b"] = raw.e // (3600 * tau)
            means = raw.groupby(["s", "b"]).v.mean().reset_index()
            for s_, grp in means.groupby("s"):
                g = grp.sort_values("b")
                bb, mm = g.b.values, g.v.values
                d = mm[1:][bb[1:] == bb[:-1] + 1] - mm[:-1][bb[1:] == bb[:-1] + 1]
                avar = 0.5 * np.mean(d * d)
                row = av[(av.series == s_) & (av.tau_hours == tau)].iloc[0]
                good &= (abs(row.allan_var - avar) < 2e-6
                         and row.n_pairs == len(d) and row.n_buckets == len(bb))
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q249 allan: bucket-mean diffs, "
              f"{len(av)} rows")

    # --- Gumbel return levels (q251): block maxima moments ---
    gb = dump("q251_gumbel_return")
    if gb is not None:
        dm = con.execute(
            "SELECT event_type s, CAST(ts AS DATE) d, max(CAST(value AS DOUBLE)) mx "
            "FROM events GROUP BY 1, 2").df()
        good = True
        gamma, c6 = 0.5772156649015329, np.sqrt(6.0) / np.pi
        for s_, grp in dm.groupby("s"):
            m, sd = grp.mx.mean(), grp.mx.std(ddof=1)
            beta = sd * c6
            mu = m - gamma * beta
            row = gb[gb.series == s_].iloc[0]
            good &= abs(row.gumbel_mu - mu) < 2e-6
            good &= abs(row.gumbel_beta - beta) < 2e-6
            for t, colname in ((30, "level_30d"), (365, "level_365d")):
                lvl = mu - beta * np.log(-np.log(1.0 - 1.0 / t))
                good &= abs(row[colname] - lvl) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q251 gumbel: moment fit, "
              f"{len(gb)} series")

    # --- Periodogram (q252): explicit centered projection per period ---
    pg = dump("q252_periodogram")
    if pg is not None:
        hm = con.execute(
            "SELECT event_type s, CAST(floor(epoch(date_trunc('hour', ts)) / 3600) "
            "AS BIGINT) h, avg(CAST(value AS DOUBLE)) y FROM events GROUP BY 1, 2").df()
        good = True
        for p in (12, 24, 168):
            th = 2.0 * np.pi / p * (hm.h.values % p)
            for s_, idx in hm.groupby("s").groups.items():
                y = hm.y.values[idx]
                cth, sth = np.cos(th[idx]), np.sin(th[idx])
                n = float(len(y))
                C = (y * cth).sum() - y.sum() / n * cth.sum()
                S = (y * sth).sum() - y.sum() / n * sth.sum()
                sse = (y * y).sum() - y.sum() ** 2 / n
                amp = 2.0 / n * np.sqrt(C * C + S * S)
                frac = 2.0 * (C * C + S * S) / (n * sse)
                row = pg[(pg.series == s_) & (pg.period_hours == p)].iloc[0]
                good &= abs(row.amplitude - amp) < 2e-6
                good &= abs(row.var_frac - frac) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q252 periodogram: centered "
              f"projection, {len(pg)} rows")

    # --- Triangle census (q246): dense adjacency A^3 trace ---
    tc = dump("q246_triangle_census")
    if tc is not None:
        eb = con.execute(
            "SELECT DISTINCT date_trunc('hour', ts) h, event_type t, "
            "CAST(json_extract_string(props, '$.k') AS INT) // 10 kd, user_id u "
            "FROM events").df()
        users = np.sort(eb.u.unique())
        uix = {u: i for i, u in enumerate(users)}
        A = np.zeros((len(users), len(users)), dtype=np.int64)
        for _, grp in eb.groupby(["h", "t", "kd"]):
            us = [uix[u] for u in grp.u.values]
            for i in range(len(us)):
                for j in range(i + 1, len(us)):
                    A[us[i], us[j]] = A[us[j], us[i]] = 1
        np.fill_diagonal(A, 0)
        tri = np.diag(A @ A @ A) // 2
        deg = A.sum(axis=1)
        good = True
        for _, row in tc.iterrows():
            i = uix[row.node]
            cl = 2.0 * tri[i] / (deg[i] * (deg[i] - 1.0)) if deg[i] >= 2 else 0.0
            good &= (row.degree == deg[i] and row.n_triangles == tri[i]
                     and abs(row.clustering - cl) < 2e-6)
        good &= len(tc) == int((deg > 0).sum())
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q246 triangles: A^3 trace, "
              f"{int(tri.sum() // 3)} triangles")

    # --- Spearman matrix (q273): scipy-free rankdata + corrcoef ---
    def rankdata(x):  # average ranks, independent of the SQL midrank path
        order = np.argsort(x, kind="mergesort")
        ranks = np.empty(len(x))
        sx = x[order]
        i = 0
        while i < len(x):
            j = i
            while j + 1 < len(x) and sx[j + 1] == sx[i]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        return ranks
    sp = dump("q273_spearman_matrix")
    if sp is not None:
        hourly = con.execute(
            "SELECT event_type s, date_trunc('hour', ts) h, "
            "floor(avg(CAST(value AS DOUBLE)) * 1e6 + 0.500618034) / 1e6 y "
            "FROM events GROUP BY 1, 2").df()
        good = True
        for _, row in sp.iterrows():
            pa = hourly[hourly.s == row.series_a].set_index("h").y
            pb = hourly[hourly.s == row.series_b].set_index("h").y
            shared = pa.index.intersection(pb.index)
            ra = rankdata(pa.loc[shared].to_numpy())
            rb = rankdata(pb.loc[shared].to_numpy())
            rho = np.corrcoef(ra, rb)[0, 1]
            good &= (row.n_hours == len(shared)
                     and abs(row.rho - rho) < 2e-6)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q273 spearman: rankdata+corrcoef "
              f"over {len(sp)} pairs")

    # --- Kruskal-Wallis (q274): dense pooled rank recomputation ---
    kw = dump("q274_kruskal_wallis")
    if kw is not None:
        df = con.execute("SELECT event_type g, CAST(value AS DOUBLE) x "
                         "FROM events").df()
        r = rankdata(df.x.to_numpy())
        N = len(df)
        sr = sum((r[df.g.to_numpy() == g].sum() ** 2) / (df.g == g).sum()
                 for g in df.g.unique())
        H = 12.0 / (N * (N + 1)) * sr - 3 * (N + 1)
        _, t = np.unique(df.x.to_numpy(), return_counts=True)
        Hc = H / (1.0 - (t ** 3 - t).sum() / (N ** 3 - N))
        row = kw.iloc[0]
        good = (row.n == N and abs(row.h - H) < 2e-5
                and abs(row.h_corrected - Hc) < 2e-5)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q274 kruskal-wallis: "
              f"numpy H={H:.4f} vs {row.h}")

    # --- Mann-Kendall (q275): explicit O(n^2) sign double loop ---
    mk = dump("q275_mann_kendall")
    if mk is not None:
        daily = con.execute(
            "SELECT event_type s, CAST(ts AS DATE) d, "
            "floor(avg(CAST(value AS DOUBLE)) * 1e6 + 0.500618034) / 1e6 y "
            "FROM events GROUP BY 1, 2 ORDER BY 1, 2").df()
        good = True
        for _, row in mk.iterrows():
            y = daily[daily.s == row.series].y.to_numpy()
            n = len(y)
            S = sum(np.sign(y[j] - y[i])
                    for i in range(n) for j in range(i + 1, n))
            _, t = np.unique(y, return_counts=True)
            var = (n * (n - 1) * (2 * n + 5)
                   - (t * (t - 1) * (2 * t + 5)).sum()) / 18.0
            z = (S - 1) / np.sqrt(var) if S > 0 else (
                (S + 1) / np.sqrt(var) if S < 0 else 0.0)
            good &= (row.n_days == n and row.s == S
                     and abs(row.var_s - var) < 2e-5
                     and abs(row.z - z) < 2e-6
                     and abs(row.tau - S / (n * (n - 1) / 2.0)) < 2e-6)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q275 mann-kendall: "
              f"double-loop S over {len(mk)} series")

    # --- Jarque-Bera (q277): scipy-style moment recomputation ---
    jb = dump("q277_jarque_bera")
    if jb is not None:
        df = con.execute("SELECT event_type g, CAST(value AS DOUBLE) x "
                         "FROM events").df()
        good = True
        for _, row in jb.iterrows():
            x = df[df.g == row.series].x.to_numpy()
            c = x - x.mean()
            S = (c ** 3).mean() / (c ** 2).mean() ** 1.5
            K = (c ** 4).mean() / (c ** 2).mean() ** 2 - 3.0
            J = len(x) / 6.0 * (S ** 2 + K ** 2 / 4.0)
            good &= (row.n == len(x) and abs(row.skewness - S) < 2e-6
                     and abs(row.kurtosis_excess - K) < 2e-6
                     and abs(row.jb - J) < 2e-3)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q277 jarque-bera: "
              f"numpy moments over {len(jb)} series")

    # --- One-way ANOVA (q278) + Brown-Forsythe (q279): textbook SS ---
    an = dump("q278_oneway_anova")
    bf = dump("q279_brown_forsythe")
    if an is not None or bf is not None:
        df = con.execute("SELECT event_type g, CAST(value AS DOUBLE) x "
                         "FROM events").df()

        def anova_f(frame):
            gm = frame.x.mean()
            groups = [frame[frame.g == g].x.to_numpy()
                      for g in frame.g.unique()]
            ssb = sum(len(x) * (x.mean() - gm) ** 2 for x in groups)
            ssw = sum(((x - x.mean()) ** 2).sum() for x in groups)
            k, N = len(groups), len(frame)
            return (ssb / (k - 1)) / (ssw / (N - k)), ssb / (ssb + ssw)
        good = True
        if an is not None:
            F, eta = anova_f(df)
            row = an.iloc[0]
            good &= abs(row.f - F) < 2e-5 and abs(row.eta_sq - eta) < 2e-6
        if bf is not None:
            z = df.copy()
            med = z.groupby("g").x.transform(
                lambda s: np.floor(np.quantile(s, 0.5) * 1e6
                                   + 0.500618034) / 1e6)
            z.x = (z.x - med).abs()
            F, eta = anova_f(z)
            row = bf.iloc[0]
            good &= abs(row.f - F) < 2e-5 and abs(row.eta_sq - eta) < 2e-6
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q278/q279 anova+brown-forsythe: "
              f"textbook SS decomposition")

    # --- Wasserstein-1 (q289): numpy trapezoid-free ECDF area ---
    ws = dump("q289_wasserstein_drift")
    if ws is not None:
        a = np.sort(con.execute("SELECT CAST(value AS DOUBLE) v FROM events "
                                "WHERE ts < TIMESTAMP '2024-01-16'").df().v)
        b = np.sort(con.execute("SELECT CAST(value AS DOUBLE) v FROM events "
                                "WHERE ts >= TIMESTAMP '2024-01-16'").df().v)
        support = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, support, 'right') / len(a)
        fb = np.searchsorted(b, support, 'right') / len(b)
        W1 = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(support)))
        row = ws.iloc[0]
        good = (row.n_ref == len(a) and row.n_cur == len(b)
                and abs(row.w1 - W1) < 2e-5)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q289 wasserstein: "
              f"numpy ECDF area {W1:.5f} vs {row.w1}")

    # --- CUPED (q290): dense covariate-adjustment recomputation ---
    cu = dump("q290_cuped")
    if cu is not None:
        import hashlib
        per = con.execute(
            "SELECT user_id u, "
            "avg(CASE WHEN ts < TIMESTAMP '2024-01-16' "
            "  THEN CAST(value AS DOUBLE) END) x, "
            "avg(CASE WHEN ts >= TIMESTAMP '2024-01-16' "
            "  THEN CAST(value AS DOUBLE) END) y "
            "FROM events GROUP BY 1").df().dropna()
        arm = per.u.map(lambda u: 'a' if int(
            hashlib.md5(str(u).encode()).hexdigest()[0], 16) < 8 else 'b')
        cx = per.x - per.x.mean()
        cy = per.y - per.y.mean()
        theta = np.floor((cx * cy).sum() / (cx * cx).sum() * 1e6
                         + 0.500618034) / 1e6
        adj = per.y - theta * cx
        ya, yb = per.y[arm == 'a'], per.y[arm == 'b']
        aa, ab = adj[arm == 'a'], adj[arm == 'b']
        vr = 1 - (aa.var(ddof=1) * (len(aa) - 1) + ab.var(ddof=1) * (len(ab) - 1)) \
            / (ya.var(ddof=1) * (len(ya) - 1) + yb.var(ddof=1) * (len(yb) - 1))
        row = cu.iloc[0]
        good = (row.n_a == len(aa) and row.n_b == len(ab)
                and abs(row.theta - theta) < 2e-6
                and abs(row.diff_adj - (aa.mean() - ab.mean())) < 2e-6
                and abs(row.var_reduction - vr) < 2e-6)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q290 cuped: theta={theta:.4f} "
              f"var_reduction={vr:.4f} vs {row.var_reduction}")

    # --- mSPRT (q297): dense trajectory replay with numpy cumsums ---
    ms = dump("q297_msprt")
    if ms is not None:
        import hashlib
        ev = con.execute("SELECT CAST(ts AS DATE) d, user_id u, "
                         "CAST(value AS DOUBLE) x FROM events ORDER BY d").df()
        ev['arm'] = ev.u.map(lambda u: 'a' if int(
            hashlib.md5(str(u).encode()).hexdigest()[0], 16) < 8 else 'b')
        days = sorted(ev.d.unique())
        r6 = lambda x: np.floor(x * 1e6 + 0.500618034) / 1e6
        lam_max, good = 0.0, True
        # key the dump by day VALUE, not position: if an early one-arm day
        # is skipped by the len<2 guard below, positional pairing would
        # read the wrong Spark row for every later day
        ms = ms.set_index(ms.day.astype(str).str[:10])
        for day in days:
            sub = ev[ev.d <= day]
            A, B = sub[sub.arm == 'a'].x, sub[sub.arm == 'b'].x
            if len(A) < 2 or len(B) < 2:
                continue
            d_ = r6(A.mean() - B.mean())
            se2 = r6(A.var(ddof=0) / len(A) + B.var(ddof=0) / len(B))
            lam = r6(np.sqrt(se2 / (se2 + 1)) *
                     np.exp(d_ * d_ / (2 * se2 * (se2 + 1))))
            lam_max = max(lam_max, lam)
            p = r6(min(1.0, 1.0 / lam_max))
            key = str(day)[:10]
            if key not in ms.index:
                good = False
                break
            row = ms.loc[key]
            good &= (abs(row['diff'] - d_) < 2e-6
                     and abs(row.p_always_valid - p) < 2e-5)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q297 msprt: dense cumulative "
              f"replay over {len(ms)} days")

    # --- BPE training (q301): full count-merge-rewrite loop replay ---
    bp = dump("q301_bpe_train")
    if bp is not None:
        import re
        from collections import Counter
        txts = con.execute("SELECT text FROM documents").df().text
        freq = Counter()
        for t in txts:
            # match Spark: trim() strips SPACES only; \s is the Java
            # (ASCII) class, not python's unicode one
            for w in re.split(r'[ \t\n\x0b\f\r]+', ('' if t is None else str(t)).strip(' ')):
                if w:
                    freq[w] += 1
        vocab = Counter()
        for w, f in freq.items():
            vocab[tuple(list(w) + ['</w>'])] += f
        merges = []
        for _ in range(len(bp)):
            pc = Counter()
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += f
            if not pc:
                break
            (a, b), cnt = min(pc.items(),
                              key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            merges.append((a, b, a + b, cnt))
            nv = Counter()
            # NB: locals must not shadow `out` (the verify dir) — doing so
            # silently killed every dump() after this block (r10 fix)
            for syms, f in vocab.items():
                rewritten, prev = [], None
                for s in syms:
                    if prev is None:
                        prev = s
                    elif prev == a and s == b:
                        rewritten.append(a + b)
                        prev = None
                    else:
                        rewritten.append(prev)
                        prev = s
                if prev is not None:
                    rewritten.append(prev)
                nv[tuple(rewritten)] += f
            vocab = nv
        bp = bp.sort_values("rank")
        good = len(bp) == len(merges) and all(
            (r.left, r.right, r.merged, int(r.cnt)) == m
            for (_, r), m in zip(bp.iterrows(), merges))
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q301 bpe: {len(merges)}-round "
              f"count-merge-rewrite loop replay matches exactly")

    # --- BPE corpus ENCODE + fertility (q336): train + apply replay ---
    be = dump("q336_bpe_encode")
    if be is not None:
        import re
        from collections import Counter

        def fuse_once(syms, a_, b_):
            rew, prev = [], None
            for s_ in syms:
                if prev is None:
                    prev = s_
                elif prev == a_ and s_ == b_:
                    rew.append(a_ + b_)
                    prev = None
                else:
                    rew.append(prev)
                    prev = s_
            if prev is not None:
                rew.append(prev)
            return rew

        docs2 = con.execute("SELECT source, text FROM documents").df()
        freq = Counter()
        per_doc = []
        for src, t in zip(docs2.source, docs2.text):
            ws = [w for w in re.split(r'[ \t\n\x0b\f\r]+', ('' if t is None else str(t)).strip(' '))
                  if w]
            per_doc.append((src, ws))
            for w in ws:
                freq[w] += 1
        vocab = Counter()
        for w, f in freq.items():
            vocab[tuple(list(w) + ['</w>'])] += f
        merges2 = []
        for _ in range(25):
            pc = Counter()
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += f
            if not pc:
                break
            (a_, b_), _cnt = min(pc.items(),
                                 key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            merges2.append((a_, b_))
            nv = Counter()
            for syms, f in vocab.items():
                nv[tuple(fuse_once(syms, a_, b_))] += f
            vocab = nv
        enc_cache = {}

        def enc_len(w):
            if w not in enc_cache:
                syms = list(w) + ['</w>']
                for a_, b_ in merges2:
                    syms = fuse_once(syms, a_, b_)
                enc_cache[w] = len(syms)
            return enc_cache[w]

        agg = {}
        for src, ws in per_doc:
            a0 = agg.setdefault(src, [0, 0, 0])
            a0[0] += 1
            a0[1] += len(ws)
            a0[2] += sum(enc_len(w) for w in ws)
        good = len(be) == len(agg)
        for _, r in be.iterrows():
            nd, nw, nt = agg.get(r.source, (0, 0, 0))
            good &= (int(r.n_docs) == nd and int(r.n_words) == nw
                     and int(r.n_tokens) == nt
                     and abs(r.bpe_fertility - r6(nt / nw)) < 2e-6)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q336 bpe encode: "
              f"trained-tokenizer fertility over {len(be)} sources matches "
              f"the full train+encode python replay")

    # --- Louvain one-level (q337): set/dict semi-sync sweep replay ---
    lv = dump("q337_louvain")
    if lv is not None:
        from collections import defaultdict
        brows = con.execute(
            "SELECT DISTINCT date_trunc('hour', ts) AS h, event_type AS t, "
            "CAST(json_extract_string(props, '$.k') AS INT) // 10 AS kd, "
            "user_id AS u FROM events").df()
        bucket = defaultdict(set)
        for h, t, kd, u in zip(brows.h, brows.t, brows.kd, brows.u):
            bucket[(h, t, kd)].add(int(u))
        edges = set()
        for us in bucket.values():
            us = sorted(us)
            for i in range(len(us)):
                for j in range(i + 1, len(us)):
                    edges.add((us[i], us[j]))
        adj = defaultdict(list)
        for u, v in edges:
            adj[u].append(v)
            adj[v].append(u)
        m = float(len(edges))
        deg = {n: float(len(vs)) for n, vs in adj.items()}
        label = {n: n for n in adj}
        for rnd in range(1, 5):
            act = rnd % 2
            stot = defaultdict(float)
            for n, l in label.items():
                stot[l] += deg[n]
            nxt = dict(label)
            for n in adj:
                if n % 2 != act:
                    continue
                kic = defaultdict(float)
                for v in adj[n]:
                    kic[label[v]] += 1.0
                kic.setdefault(label[n], 0.0)
                best = None
                for c, k in kic.items():
                    sadj = stot[c] - (deg[n] if c == label[n] else 0.0)
                    s = float(r6(k - deg[n] * sadj / (2.0 * m)))
                    if best is None or (s, -c) > (best[0], -best[1]):
                        best = (s, c)
                nxt[n] = best[1]
            label = nxt
        comm = defaultdict(lambda: [0, 0.0, 0.0])   # n_nodes, n_int, stot
        for n, l in label.items():
            comm[l][0] += 1
            comm[l][2] += deg[n]
        for u, v in edges:
            if label[u] == label[v]:
                comm[label[u]][1] += 1.0
        q_mod = sum(ni / m - (st / (2.0 * m)) ** 2
                    for _, ni, st in comm.values())
        top = sorted(((c, nn, ni, st) for c, (nn, ni, st) in comm.items()),
                     key=lambda x: (-x[1], x[0]))[:20]
        good = len(lv) == len(top)
        lv2 = lv.sort_values(["n_nodes", "community"],
                             ascending=[False, True]).reset_index(drop=True)
        for (c, nn, ni, st), (_, r) in zip(top, lv2.iterrows()):
            good &= (int(r.community) == c and int(r.n_nodes) == nn
                     and int(r.n_internal) == int(ni)
                     and int(r.sigma_tot) == int(st)
                     and abs(r.modularity - r6(q_mod)) < 2e-6)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q337 louvain: semi-sync "
              f"set/dict sweep over {len(adj)} nodes / {len(edges)} edges, "
              f"Q={q_mod:.6f}")

    # --- Louvain multi-level (q347): semi-sync level 1 + contraction +
    # sequential local moving + keep-best, all replayed in sets/dicts ---
    ml = dump("q347_louvain_multilevel")
    if ml is not None:
        from collections import defaultdict
        brows = con.execute(
            "SELECT DISTINCT date_trunc('hour', ts) AS h, event_type AS t, "
            "CAST(json_extract_string(props, '$.k') AS INT) // 10 AS kd, "
            "user_id AS u FROM events").df()
        bucket = defaultdict(set)
        for h, t, kd, u in zip(brows.h, brows.t, brows.kd, brows.u):
            bucket[(h, t, kd)].add(int(u))
        edges = set()
        for us in bucket.values():
            us = sorted(us)
            for i in range(len(us)):
                for j in range(i + 1, len(us)):
                    edges.add((us[i], us[j]))
        adj = defaultdict(list)
        for u, v in edges:
            adj[u].append(v)
            adj[v].append(u)
        m = float(len(edges))
        deg = {n: float(len(vs)) for n, vs in adj.items()}
        label = {n: n for n in adj}
        for rnd in range(1, 5):          # level 1: the q337 sweep verbatim
            act = rnd % 2
            stot = defaultdict(float)
            for n, l in label.items():
                stot[l] += deg[n]
            nxt = dict(label)
            for n in adj:
                if n % 2 != act:
                    continue
                kic = defaultdict(float)
                for v in adj[n]:
                    kic[label[v]] += 1.0
                kic.setdefault(label[n], 0.0)
                best = None
                for c, k in kic.items():
                    sadj = stot[c] - (deg[n] if c == label[n] else 0.0)
                    sc = float(r6(k - deg[n] * sadj / (2.0 * m)))
                    if best is None or (sc, -c) > (best[0], -best[1]):
                        best = (sc, c)
                nxt[n] = best[1]
            label = nxt

        def quality(lab):
            comm = defaultdict(lambda: [0, 0.0, 0.0])
            for n, l in lab.items():
                comm[l][0] += 1
                comm[l][2] += deg[n]
            for u, v in edges:
                if lab[u] == lab[v]:
                    comm[lab[u]][1] += 1.0
            q = sum(ni / m - (st / (2.0 * m)) ** 2
                    for _, ni, st in comm.values())
            return comm, q

        _, q1v = quality(label)
        # contraction: communities -> weighted super-graph with self-loops
        superw = defaultdict(float)
        for u, v in edges:
            a, b = label[u], label[v]
            superw[(min(a, b), max(a, b))] += 1.0
        sadj = defaultdict(dict)
        sself = defaultdict(float)
        m2 = sum(superw.values())
        for (a, b), w in superw.items():
            if a == b:
                sself[a] += w
            else:
                sadj[a][b] = sadj[a].get(b, 0.0) + w
                sadj[b][a] = sadj[b].get(a, 0.0) + w
        snodes = sorted(set(sadj) | set(sself))
        k2 = {n: sum(sadj[n].values()) + 2.0 * sself[n] for n in snodes}
        lab2 = {n: n for n in snodes}
        stot2 = {n: k2[n] for n in snodes}
        for _pass in range(4):           # sequential local moving
            moved = False
            for n in snodes:
                cur = lab2[n]
                kic = defaultdict(float)
                for nb, w in sadj[n].items():
                    kic[lab2[nb]] += w
                cands = sorted(set(kic) | {cur})

                def gain(c):
                    a_ = stot2.get(c, 0.0) - (k2[n] if c == cur else 0.0)
                    return float(r6(kic.get(c, 0.0)
                                    - k2[n] * a_ / (2.0 * m2)))
                best = max(cands, key=lambda c: (gain(c), -c))
                if best != cur and gain(best) > gain(cur):
                    stot2[cur] -= k2[n]
                    stot2[best] = stot2.get(best, 0.0) + k2[n]
                    lab2[n] = best
                    moved = True
            if not moved:
                break
        composed = {n: lab2[label[n]] for n in adj}
        comm2, q2v = quality(composed)
        commf, qf = (comm2, q2v) if q2v + 1e-12 >= q1v \
            else quality(label)
        top = sorted(((c, nn, ni, st) for c, (nn, ni, st) in commf.items()),
                     key=lambda x: (-x[1], x[0]))[:20]
        good = len(ml) == len(top) and q2v + 1e-12 >= q1v
        ml2 = ml.sort_values(["n_nodes", "community"],
                             ascending=[False, True]).reset_index(drop=True)
        for (c, nn, ni, st), (_, r) in zip(top, ml2.iterrows()):
            good &= (int(r.community) == c and int(r.n_nodes) == nn
                     and int(r.n_internal) == int(ni)
                     and int(r.sigma_tot) == int(st)
                     and abs(r.modularity_l1 - r6(q1v)) < 2e-6
                     and abs(r.modularity_l2 - r6(qf)) < 2e-6)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q347 louvain multilevel: "
              f"contraction + sequential local moving, "
              f"Q1={q1v:.6f} -> Q2={qf:.6f}")

    # --- Quality classifier (q338): full featurize + Newton replay ---
    qc = dump("q338_quality_classifier")
    if qc is not None:
        import hashlib, math
        from collections import defaultdict
        docs3 = con.execute(
            "SELECT doc_id, source, text FROM documents").df()
        rows = []
        for did, src, t in zip(docs3.doc_id, docs3.source, docs3.text):
            ws = [w for w in re.split(r'[ \t\n\x0b\f\r]+', ('' if t is None else str(t)).strip(' '))
                  if w != '']
            n = len(ws)
            tf = (max(ws.count(x) for x in set(ws)) / n) if n else None
            bigrams = [f"{ws[i]} {ws[i + 1]}" for i in range(n - 1)]
            dg = (1.0 - len(set(bigrams)) / (n - 1)) if n > 1 else 0.0
            sr = sum(1 for w in ws if w in STOP) / n if n else 0.0
            keep = int(tf is not None and r6(tf) <= 0.2 and r6(dg) <= 0.3
                       and r6(sr) >= 0.05 and n >= 50)
            rows.append((did, src, keep, n, bigrams))
        B = 4096
        ct = np.zeros(B)
        cr = np.zeros(B)
        def bkt(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:3], 16) % B
        for _, _, keep, _, bigrams in rows:
            for g in bigrams:
                if keep:
                    ct[bkt(g)] += 1
                else:
                    cr[bkt(g)] += 1
        nt_, nr_ = ct.sum(), cr.sum()
        lr = r6(np.log((ct + 1.0) / (nt_ + B)) - np.log((cr + 1.0) / (nr_ + B)))
        groups = defaultdict(list)
        for _, src, keep, n, bigrams in rows:
            x1 = float(r6(sum(lr[bkt(g)] for g in bigrams) / len(bigrams))) \
                if bigrams else 0.0
            x2 = float(r6(math.log(n + 1.0)))
            groups[src].append((float(keep), x1, x2))
        good = True
        for _, r in qc.iterrows():
            pts = np.array(groups[r.source])
            y, x1, x2 = pts[:, 0], pts[:, 1], pts[:, 2]
            b = np.zeros(3)
            for _ in range(4):
                z = np.clip(b[0] + b[1] * x1 + b[2] * x2, -30.0, 30.0)
                p = 1.0 / (1.0 + np.exp(-z))
                w = p * (1.0 - p)
                g = np.array([np.sum(y - p), np.sum((y - p) * x1),
                              np.sum((y - p) * x2)])
                H = np.array([
                    [np.sum(w), np.sum(w * x1), np.sum(w * x2)],
                    [np.sum(w * x1), np.sum(w * x1 * x1), np.sum(w * x1 * x2)],
                    [np.sum(w * x2), np.sum(w * x1 * x2), np.sum(w * x2 * x2)]])
                b = r6(b + np.linalg.solve(H, g))
            good &= (abs(r.b0 - b[0]) < 2e-6 and abs(r.b1 - b[1]) < 2e-6
                     and abs(r.b2 - b[2]) < 2e-6)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q338 classifier: hashed-bigram "
              f"NB features + 4-step Newton trajectory over {len(qc)} "
              f"sources (numpy linalg.solve vs the Cramer plan)")

    # --- Cox PH (q340): explicit per-event risk-set loops ---
    cx = dump("q340_cox_ph")
    if cx is not None:
        import math
        # 3-day activation-window cohort: converted = purchase within
        # 3 days of first touch; everyone else administratively censored
        # at day 3 (the q340 gate's e = 0 rows)
        subj = con.execute(
            "SELECT CASE WHEN pd IS NOT NULL AND pd <= 3 "
            "THEN CAST(pd AS DOUBLE) ELSE 3.0 END AS t, "
            "CASE WHEN pd IS NOT NULL AND pd <= 3 THEN 1 ELSE 0 END AS e, "
            "x FROM (SELECT date_diff('day', CAST(min(ts) AS DATE), "
            "CAST(min(CASE WHEN event_type = 'purchase' THEN ts END) "
            "AS DATE)) AS pd, "
            "ln(CAST(count(*) AS DOUBLE)) AS x "
            "FROM events GROUP BY user_id)").df()
        tv = subj.t.to_numpy()
        evt = subj.e.to_numpy()
        xv = r6(subj.x.to_numpy())
        times = np.unique(tv[evt == 1])

        def cox_stats(b):
            U = I = dls0 = sdx = 0.0
            for et in times:
                risk = xv[tv >= et]
                ev = xv[(tv == et) & (evt == 1)]
                w = np.exp(b * risk)
                s0 = w.sum(); s1 = (risk * w).sum(); s2 = (risk ** 2 * w).sum()
                d = len(ev)
                U += ev.sum() - d * s1 / s0
                I += d * (s2 / s0 - (s1 / s0) ** 2)
                dls0 += d * math.log(s0)
                sdx += ev.sum()
            return U, I, dls0, sdx

        b = 0.0
        for _ in range(3):
            U, I, _, _ = cox_stats(b)
            b = float(r6(b + U / I))
        U, I, dls0, sdx = cox_stats(b)
        r = cx.iloc[0]
        good = (int(r.n) == len(tv) and int(r.n_events) == int(evt.sum())
                and int(r.n_events) < int(r.n)  # the gate must exercise censoring
                and abs(r.beta - b) < 2e-6
                and abs(r.hazard_ratio - r6(math.exp(b))) < 2e-6
                and abs(r.se_beta - r6(1.0 / math.sqrt(I))) < 2e-6
                and abs(r.z_wald - r6(b * math.sqrt(I))) < 2e-6
                and abs(r.log_lik - r6(b * sdx - dls0)) < 2e-5)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q340 cox ph: per-event "
              f"risk-set loop Newton over {len(tv)} subjects "
              f"({len(tv) - int(evt.sum())} censored), beta={b:.6f}")

    # --- GARCH(1,1) filter (q341): pandas recursion per series ---
    gv = dump("q341_garch_vol")
    if gv is not None:
        hourly = con.execute(
            "SELECT event_type s, date_trunc('hour', ts) h, "
            "avg(CAST(value AS DOUBLE)) v FROM events "
            "GROUP BY 1, 2 ORDER BY 1, 2").df()
        # ffill onto the full hourly grid (the series() fixture semantics)
        lo, hi = hourly.h.min(), hourly.h.max()
        grid = pd.date_range(lo, hi, freq="h")
        good = True
        n_checked = 0
        om, al, be_ = 5.0, 0.05, 0.9
        for s_, sub in hourly.groupby("s"):
            v = sub.set_index("h").v.reindex(grid).ffill().dropna()
            x = v.to_numpy()
            if len(x) < 2:
                continue
            r = np.diff(x)
            h = np.empty(len(r))
            h[0] = om / (1.0 - al - be_)
            for j in range(1, len(r)):
                h[j] = om + al * r[j - 1] * r[j - 1] + be_ * h[j - 1]
            mine = pd.DataFrame({
                "ts": v.index[1:], "ret": r6(r), "sigma": r6(np.sqrt(h)),
                "z": r6(r / np.sqrt(h))})
            got = gv[gv.event_type == s_].sort_values("ts")
            if len(got) != len(mine):
                good = False
                break
            for c in ["ret", "sigma", "z"]:
                good &= bool(np.all(np.abs(got[c].to_numpy()
                                           - mine[c].to_numpy()) < 2e-6))
            n_checked += len(got)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q341 garch: pandas recursion "
              f"replay over {n_checked} grid innovations")

    # --- GARCH variance-targeting fit (q346): pandas moments + fitted
    # recursion per series (the q341 replay with the closed-form MoM
    # param chain recomputed independently) ---
    gf = dump("q346_garch_fit")
    if gf is not None:
        import math
        hourly = con.execute(
            "SELECT event_type s, date_trunc('hour', ts) h, "
            "avg(CAST(value AS DOUBLE)) v FROM events "
            "GROUP BY 1, 2 ORDER BY 1, 2").df()
        lo, hi = hourly.h.min(), hourly.h.max()
        grid = pd.date_range(lo, hi, freq="h")
        good = True
        n_checked = 0
        for s_, sub in hourly.groupby("s"):
            v = sub.set_index("h").v.reindex(grid).ffill().dropna()
            x = v.to_numpy()
            if len(x) < 2:
                continue
            r = np.diff(x)
            a = r * r
            mr, ma, maa = r.mean(), a.mean(), (a * a).mean()
            g0 = maa - ma * ma
            s2 = float(r6(ma - mr * mr))

            def rho(k):
                if g0 <= 0 or len(a) <= k:
                    return 0.0
                at, al_ = a[k:], a[:-k]
                nk = float(len(at))
                return float(r6((np.sum(at * al_) - ma * np.sum(at)
                                 - ma * np.sum(al_) + nk * ma * ma)
                                / nk / g0))
            rho1, rho2 = rho(1), rho(2)
            phi = float(r6(min(0.98, max(0.0, rho2 / rho1))
                           if rho1 > 0 and rho2 > 0 else 0.0))
            if phi <= 0 or rho1 <= 0:
                araw = 0.0
            elif abs(phi - rho1) < 1e-9:
                araw = rho1
            else:
                B = 1.0 - phi * phi
                disc = B * B + 4.0 * (phi - rho1) * rho1 * B
                araw = rho1 if disc < 0 else \
                    (-B + math.sqrt(disc)) / (2.0 * (phi - rho1))
            alpha = float(r6(min(phi, max(0.0, araw))))
            beta = float(r6(phi - alpha))
            omega = float(r6(s2 * (1.0 - alpha - beta)))
            h = np.empty(len(r))
            h[0] = omega / (1.0 - alpha - beta)
            for j in range(1, len(r)):
                h[j] = omega + alpha * r[j - 1] * r[j - 1] + beta * h[j - 1]
            got = gf[gf.event_type == s_].sort_values("ts")
            if len(got) != len(r):
                good = False
                break
            good &= bool(abs(got.alpha.iloc[0] - alpha) < 1e-9
                         and abs(got.beta.iloc[0] - beta) < 1e-9
                         and abs(got.omega.iloc[0] - omega) < 1e-9)
            sig = np.where(h > 0, np.sqrt(np.maximum(h, 0)), 0.0)
            zv = np.where(h > 0, r / np.where(h > 0, np.sqrt(np.maximum(h, 0)), 1.0), np.nan)
            good &= bool(np.all(np.abs(got.ret.to_numpy() - r6(r)) < 2e-6))
            good &= bool(np.all(np.abs(got.sigma.to_numpy() - r6(sig)) < 2e-6))
            gz = got.z.to_numpy()
            mask = ~np.isnan(zv)
            good &= bool(np.all(np.isnan(gz) == ~mask))
            good &= bool(np.all(np.abs(gz[mask] - r6(zv[mask])) < 2e-6))
            n_checked += len(got)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q346 garch fit: pandas "
              f"moment-chain + fitted recursion over {n_checked} "
              f"innovations")

    # --- DBSCAN (q342): dense numpy pairs + python union-find ---
    db = dump("q342_dbscan")
    if db is not None:
        con.execute(f"CREATE VIEW IF NOT EXISTS embeddings AS "
                    f"SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
        emb = con.execute(
            "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").df()
        ids = emb.vec_id.to_numpy()
        V = np.stack(emb.embedding.values).astype(float)
        nv = np.linalg.norm(V, axis=1)
        S = (V @ V.T) / np.outer(nv, nv)
        S = r6(S)
        np.fill_diagonal(S, -2.0)
        adjm = S >= 0.3
        nn = adjm.sum(axis=1)
        core = nn + 1 >= 5
        parent = list(range(len(ids)))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        ii, jj = np.nonzero(np.triu(adjm & np.outer(core, core)))
        for a_, b_ in zip(ii, jj):
            ra, rb = find(int(a_)), find(int(b_))
            if ra != rb:
                if ids[ra] < ids[rb]:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        cluster = {}
        ptype = {}
        for i in range(len(ids)):
            if core[i]:
                cluster[ids[i]] = ids[find(i)]
                ptype[ids[i]] = "core"
            else:
                cn = [cluster.get(ids[j]) for j in np.nonzero(adjm[i])[0]
                      if core[j]]
                # border adopts the MIN core-neighbor cluster; else noise
                if cn:
                    cluster[ids[i]] = min(ids[find(j)]
                                          for j in np.nonzero(adjm[i])[0]
                                          if core[j])
                    ptype[ids[i]] = "border"
                else:
                    cluster[ids[i]] = None
                    ptype[ids[i]] = "noise"
        good = len(db) == len(ids)
        for _, r in db.iterrows():
            vid = int(r.vec_id)
            want = cluster[vid]
            got = None if pd.isna(r.cluster) else int(r.cluster)
            good &= (r.point_type == ptype[vid] and got == want
                     and int(r.n_neighbors) == int(nn[list(ids).index(vid)]))
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q342 dbscan: dense numpy "
              f"pairs + union-find replay over {len(ids)} vectors "
              f"({int(core.sum())} core)")

    # --- DBSCAN over banded LSH (q344): java-Random planes + band
    # buckets + the same union-find, asserting banded adjacency == exact ---
    dbl = dump("q344_dbscan_lsh")
    if dbl is not None:
        con.execute(f"CREATE VIEW IF NOT EXISTS embeddings AS "
                    f"SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
        emb = con.execute(
            "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").df()
        ids = emb.vec_id.to_numpy()
        V = np.stack(emb.embedding.values).astype(float)

        # scala.util.Random == java.util.Random: 48-bit LCG + Marsaglia
        # polar nextGaussian — the hyperplanes(seed=13, 24, 64) replay
        _M48 = (1 << 48) - 1

        class _JR:
            def __init__(self, seed):
                self.s = (seed ^ 0x5DEECE66D) & _M48
                self.g = None
            def _n(self, bits):
                self.s = (self.s * 0x5DEECE66D + 0xB) & _M48
                return self.s >> (48 - bits)
            def nd(self):
                return ((self._n(26) << 27) + self._n(27)) / float(1 << 53)
            def ng(self):
                import math as _m
                if self.g is not None:
                    g = self.g; self.g = None; return g
                while True:
                    v1 = 2 * self.nd() - 1; v2 = 2 * self.nd() - 1
                    t = v1 * v1 + v2 * v2
                    if 0 < t < 1:
                        mlt = _m.sqrt(-2 * _m.log(t) / t)
                        self.g = v2 * mlt
                        return v1 * mlt

        _jr = _JR(13)
        P = np.array([[_jr.ng() for _ in range(64)] for _ in range(24)])
        sig = (V @ P.T) > 0  # n x 24 sign bits
        nv = np.linalg.norm(V, axis=1)
        S = r6((V @ V.T) / np.outer(nv, nv))
        np.fill_diagonal(S, -2.0)
        exact_adj = S >= 0.4
        cand = np.zeros_like(exact_adj)
        for b in range(12):
            key = sig[:, 2 * b] + 2 * sig[:, 2 * b + 1]
            same = key[:, None] == key[None, :]
            cand |= same
        np.fill_diagonal(cand, False)
        lsh_adj = cand & (S >= 0.4)
        recall_ok = bool((exact_adj == lsh_adj).all())
        nn2 = lsh_adj.sum(axis=1)
        core2 = nn2 + 1 >= 3
        parent2 = list(range(len(ids)))

        def find2(a):
            while parent2[a] != a:
                parent2[a] = parent2[parent2[a]]
                a = parent2[a]
            return a

        ii, jj = np.nonzero(np.triu(lsh_adj & np.outer(core2, core2)))
        for a_, b_ in zip(ii, jj):
            ra, rb = find2(int(a_)), find2(int(b_))
            if ra != rb:
                if ids[ra] < ids[rb]:
                    parent2[rb] = ra
                else:
                    parent2[ra] = rb
        cl2 = {}
        pt2 = {}
        for i in range(len(ids)):
            if core2[i]:
                cl2[ids[i]] = ids[find2(i)]
                pt2[ids[i]] = "core"
            else:
                cn = [j for j in np.nonzero(lsh_adj[i])[0] if core2[j]]
                if cn:
                    cl2[ids[i]] = min(ids[find2(j)] for j in cn)
                    pt2[ids[i]] = "border"
                else:
                    cl2[ids[i]] = None
                    pt2[ids[i]] = "noise"
        good = recall_ok and len(dbl) == len(ids)
        idx_of = {v: i for i, v in enumerate(ids)}
        for _, r in dbl.iterrows():
            vid = int(r.vec_id)
            got = None if pd.isna(r.cluster) else int(r.cluster)
            good &= (r.point_type == pt2[vid] and got == cl2[vid]
                     and int(r.n_neighbors) == int(nn2[idx_of[vid]]))
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q344 dbscan lsh: banded "
              f"java-Random-plane replay over {len(ids)} vectors, "
              f"band recall {'1.0' if recall_ok else 'BROKEN'}")

    # --- Yule-Walker AR(2) (q280): dense lagged-vector products ---
    yw = dump("q280_yule_walker_ar2")
    if yw is not None:
        hourly = con.execute(
            "SELECT event_type s, CAST(floor(epoch(date_trunc('hour', ts)) "
            "/ 3600) AS BIGINT) idx, avg(CAST(value AS DOUBLE)) y "
            "FROM events GROUP BY 1, 2 ORDER BY 1, 2").df()
        good = True
        for _, row in yw.iterrows():
            h = hourly[hourly.s == row.series]
            idx = h.idx.to_numpy()
            c = h.y.to_numpy() - h.y.mean()
            pos = {v: i for i, v in enumerate(idx)}
            c0 = (c ** 2).sum()
            r = []
            for l in (1, 2):
                # gap-robust: only pairs whose t-l hour actually exists
                mask = np.array([v - l in pos for v in idx])
                prev = np.array([pos[v - l] for v in idx[mask]])
                rl = (c[mask] * c[prev]).sum() / c0
                r.append(np.floor(rl * 1e6 + 0.500618034) / 1e6)
            r1, r2 = r
            phi1 = r1 * (1 - r2) / (1 - r1 * r1)
            phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
            good &= (row.n_hours == len(h) and abs(row.r1 - r1) < 2e-6
                     and abs(row.phi1 - phi1) < 2e-6
                     and abs(row.phi2 - phi2) < 2e-6)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q280 yule-walker: "
              f"dense lagged products over {len(yw)} series")

    # --- k-core (q323): plain-python peel with sets, vs the join loop ---
    kc = dump("q323_kcore")
    if kc is not None:
        edges = set(map(tuple, con.execute(
            "WITH b AS (SELECT DISTINCT date_trunc('hour', ts) h, event_type t, "
            "CAST(json_extract_string(props, '$.k') AS INT) // 10 kd, user_id u "
            "FROM events) SELECT DISTINCT a.u, b2.u FROM b a JOIN b b2 "
            "ON a.h=b2.h AND a.t=b2.t AND a.kd=b2.kd AND a.u < b2.u"
        ).fetchall()))
        from collections import Counter
        E = set(edges)
        while True:
            deg = Counter()
            for u, v in E:
                deg[u] += 1
                deg[v] += 1
            keep = {n for n, dd in deg.items() if dd >= 2}
            E2 = {(u, v) for u, v in E if u in keep and v in keep}
            if E2 == E:
                break
            E = E2
        want = {n: dd for n, dd in deg.items() if dd >= 2}
        got = {int(r.node): int(r.degree) for _, r in kc.iterrows()}
        good = got == want
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q323 k-core: python set peel "
              f"({len(want)} core nodes) matches the join loop")

    # --- DTW (q324): full-matrix numpy DP with a band mask, vs the
    #     two-row banded scan ---
    dt = dump("q324_dtw_profiles")
    if dt is not None:
        grid = con.execute(
            "WITH hours AS (SELECT unnest(generate_series("
            "  date_trunc('hour', (SELECT min(ts) FROM events)),"
            "  date_trunc('hour', (SELECT max(ts) FROM events)),"
            "  INTERVAL 1 HOUR)) h),"
            "keys AS (SELECT DISTINCT event_type t FROM events),"
            "hourly AS (SELECT event_type t, date_trunc('hour', ts) h,"
            "  avg(CAST(value AS DOUBLE)) v FROM events GROUP BY 1, 2),"
            "al AS (SELECT keys.t, hours.h, hourly.v FROM hours"
            "  CROSS JOIN keys LEFT JOIN hourly"
            "  ON hourly.t = keys.t AND hourly.h = hours.h)"
            "SELECT t, h, last_value(v IGNORE NULLS) OVER ("
            "  PARTITION BY t ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING"
            "  AND CURRENT ROW) v FROM al ORDER BY t, h").df()
        rnd = lambda x: np.floor(x * 1e6 + 0.500618034) / 1e6
        series = {}
        for t_, g in grid.dropna(subset=["v"]).groupby("t"):
            v = g.v.to_numpy()
            mu = rnd(v.mean())
            sd = rnd(np.sqrt((v ** 2).mean() - v.mean() ** 2))
            if sd > 0:
                series[t_] = (v - mu) / sd
        good = True
        for _, row in dt.iterrows():
            a, b = series[row.series_a], series[row.series_b]
            n, mm = len(a), len(b)
            w = max(24, abs(n - mm))
            D = np.full((n + 1, mm + 1), np.inf)
            D[0, 0] = 0.0
            for i in range(1, n + 1):
                for j in range(max(1, i - w), min(mm, i + w) + 1):
                    D[i, j] = abs(a[i - 1] - b[j - 1]) + min(
                        D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
            good &= (row.n_a == n and row.n_b == mm
                     and abs(row.dtw - D[n, mm]) < 2e-6)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q324 dtw: full-matrix numpy DP "
              f"over {len(dt)} pairs matches the banded two-row scan")

    # --- Lloyd k-means (q326): numpy replay of the full trajectory ---
    km = dump("q326_kmeans_embeddings")
    if km is not None:
        emb = con.execute(
            f"SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v "
            f"FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id"
        ).df()
        X = np.stack(emb.v.to_numpy())
        rnd = lambda x: np.floor(x * 1e6 + 0.500618034) / 1e6
        k, iters = 8, 5
        cents = X[:k].copy()  # smallest-id init (emb is id-ordered)
        for _ in range(iters):
            d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)  # first-min tie break, same as Spark
            for c in range(k):
                if (a == c).any():
                    cents[c] = rnd(X[a == c].mean(axis=0))
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        good = True
        for _, row in km.iterrows():
            c = int(row.cluster_id)
            mask = a == c
            good &= (int(row.n_points) == int(mask.sum())
                     and abs(row.inertia - d2[mask, c].sum()) < 1e-4
                     and abs(row.centroid_norm
                             - np.sqrt((cents[c] ** 2).sum())) < 2e-6)
        good &= len(km) == len(np.unique(a))
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} q326 k-means: numpy trajectory "
              f"replay over {len(X)} vectors, {len(km)} live clusters")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
