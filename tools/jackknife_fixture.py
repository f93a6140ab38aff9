# Independent jackknife-vcov fixture generator (driver-side python only).
#
# Computes delete-one-cluster JKn standard errors for three scenarios on
# the reference fpc design (tests/test_data_files/fpc_data.csv) with a
# standalone numpy implementation that follows the published R `survey`
# JKn definition (svyrecvar/jknweights: drop cluster hj, reweight the
# remaining clusters of stratum h by nh/(nh-1), center replicates at the
# full-sample estimate, scale by (nh-1)/nh and 1-fpc_h). Nothing here
# calls or mirrors the Scala code — PropertySpec asserts the engine's
# SurveyKernel.jackknifeVcov against these numbers at rtol 1e-8.
#
# Run: python3 tools/jackknife_fixture.py  (prints the Scala fixture map)
import csv
import math

import numpy as np

rows = list(csv.DictReader(open("/root/reference/tests/test_data_files/fpc_data.csv")))
strat = np.array([r["stratid"] for r in rows])
clust = np.array([f'{r["stratid"]}-{r["psuid"]}' for r in rows])  # nest=True
w_raw = np.array([float(r["weight"]) for r in rows])
x = np.array([float(r["x"]) for r in rows])
y = np.array([float(r["y"]) for r in rows])
Nh = np.array([float(r["Nh"]) for r in rows])
w = w_raw / w_raw.mean()  # reference normalizes pre-subset
X = np.column_stack([np.ones_like(x), x])

clusters = sorted(set(clust))
strat_of = {c: strat[clust == c][0] for c in clusters}
nh_of = {s: len({c for c in clusters if strat_of[c] == s}) for s in set(strat)}
# fpc: population sizes -> sampled stratum row count / Nh (survey_design.py:291)
rows_per_strat = {s: int((strat == s).sum()) for s in set(strat)}
fpc_of = {c: rows_per_strat[strat_of[c]] / Nh[clust == c][0] for c in clusters}


def wls(X, z, wt):
    XtW = X.T * wt
    return np.linalg.solve(XtW @ X, XtW @ z)


def fit_gaussian(X, y, wt):
    return wls(X, y, wt)


def fit_binomial(X, y, wt, max_iter=100, tol=1e-8):
    # statsmodels-style IRLS (same algorithm the engine replicates)
    mu = (y + 0.5) / 2.0
    eta = np.log(mu / (1.0 - mu))

    def dev(mu):
        m = np.clip(mu, 1e-10, 1 - 1e-10)
        t1 = np.where(y > 0, y * np.log(np.where(y > 0, y / m, 1.0)), 0.0)
        t2 = np.where(y < 1, (1 - y) * np.log(np.where(y < 1, (1 - y) / (1 - m), 1.0)), 0.0)
        return 2.0 * np.sum(wt * (t1 + t2))

    d = dev(mu)
    for _ in range(max_iter):
        v = np.maximum(mu * (1.0 - mu), 1e-10)
        z = eta + (y - mu) / v
        beta = wls(X, z, wt * v)
        eta = X @ beta
        mu = 1.0 / (1.0 + np.exp(-eta))
        nd = dev(mu)
        if abs(nd - d) <= tol * (abs(d) + tol):
            return beta
        d = nd
    return beta


def jackknife_se(fit, use_fpc):
    beta_full = fit(X, y, w)
    p = len(beta_full)
    vcov = np.zeros((p, p))
    for c in clusters:
        s = strat_of[c]
        nh = nh_of[s]
        wr = np.where(clust == c, 0.0, np.where(strat == s, w * nh / (nh - 1), w))
        diff = fit(X, y, wr) - beta_full
        mh = math.sqrt((nh - 1) / nh) if nh > 1 else 1.0
        fh = math.sqrt(1.0 - fpc_of[c]) if use_fpc else 1.0
        r = diff * mh * fh
        vcov += np.outer(r, r)
    return np.sqrt(np.diag(vcov))


scenarios = {
    "gaussian_nofpc": jackknife_se(fit_gaussian, use_fpc=False),
    "gaussian_fpc": jackknife_se(fit_gaussian, use_fpc=True),
    "binomial_nofpc": jackknife_se(
        lambda X_, y_, w_: fit_binomial(X_, (y > np.median(y)).astype(float), w_),
        use_fpc=False,
    ),
}
for name, se in scenarios.items():
    print(f'    "{name}" -> Seq({se[0]!r}, {se[1]!r}),')
