#!/usr/bin/env python3
"""Golden-fixture generator: numpy mirror of graft.core.TokenGen plus
plain-numpy re-expressions of the reference's feature extractors
(pymhealth semantics, see SURVEY.md §2), emitting JSON fixtures consumed
by the ScalaTest suites (FIXTURES.md).

Deterministic, no external data. Rerun: python3 tools/gen_fixtures.py
Writes src/test/resources/fixtures/*.json
"""
import json
import math
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

MASK = (1 << 64) - 1


def mix(z):
    z = (z + 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


def h2(seed, a):
    return mix(seed ^ mix(a))


def h3(seed, a, b):
    return mix(mix(seed ^ mix(a)) ^ mix(b))


VOCAB, MIN_TOK, TOK_SPAN, SEED = 50257, 64, 1985, 42


def n_tok(i, skewed=False):
    base = MIN_TOK + h2(SEED, i) % TOK_SPAN
    if skewed and h2(99, i) % 100 == 0:
        return base * 32
    return base


def token(i, p):
    return (h3(SEED, i, p) >> 33) % VOCAB


def source(i):
    r = h2(1337, i) % 100
    return "web" if r < 48 else "chat" if r < 72 else \
        "code" if r < 88 else "wiki"


def tokens(i, skewed=False):
    return np.array([token(i, p) for p in range(n_tok(i, skewed))],
                    dtype=np.int64)


# ---- reference-shaped oracles (pymhealth semantics; numpy defaults) ----

def entropy(x):                         # information.py:10-20
    x = x / np.sum(x)
    x = x + 1e-30
    return float(-np.sum(x * np.log(x)))


def o1fit(x, y):                        # timedom.py:262-279 -> (A, b)
    n = len(x)
    sumx = np.sum(x)
    b = ((n * np.sum(x * y)) - (sumx * np.sum(y))) / \
        ((n * np.sum(x * x)) - (sumx * sumx))
    A = np.mean(y) - (b * np.mean(x))
    return float(A), float(b)


def hurst(x, lags=np.arange(2, 64)):    # timedom.py:238-259
    tau = np.array([np.sqrt(np.std(x[l:] - x[:-l])) for l in lags])
    A, b = o1fit(np.log(lags), np.log(tau))
    return b * 2.0


def gradient(x):                        # timedom.py:11-31
    out = np.empty(len(x))
    out[1:-1] = (x[2:] - x[:-2]) / 2.0
    out[0] = x[1] - x[0]
    out[-1] = x[-1] - x[-2]
    return out


def zero_crossings(x, th=0.0):          # timedom.py:34-49
    y = np.where(np.abs(x) <= th, 0.0, x)
    pos = y > 0
    return np.logical_xor(pos[1:], pos[:-1])


def hjorth(x):                          # timedom.py:81-193
    g1 = gradient(x)
    g2 = gradient(g1)
    act = np.var(x)
    mob = np.sqrt(np.var(g1) / np.var(x))
    comp = np.sqrt(np.var(g2) / np.var(g1)) / mob
    return float(act), float(mob), float(comp)


def moving_average(x, w):               # qrs.py:19-22
    return np.convolve(x, np.ones(w) / w, mode="same")


def slope_sum(x, w):                    # ppg.py:28-42
    out = np.zeros(len(x))
    dx = np.diff(x)
    for i in range(w, len(x) - 1):
        out[i] = np.sum(dx[i - w:i])
    return out


def get_indices(index, wsize, wstep):   # windows.py:162-178
    starts = np.arange(index[0], index[-1], wstep)
    ends = starts + wsize
    se = np.concatenate((starts, ends))
    return np.searchsorted(index, se).reshape((2, len(starts)))


def nonuniform_apply(func, index, arr, wsize, wstep, min_window_len=1):
    idx = get_indices(index, wsize, wstep)
    out = np.zeros(idx.shape[1])
    for i in range(idx.shape[1]):
        si, ei = idx[0, i], idx[1, i]
        out[i] = func(arr[si:ei]) if ei - si >= min_window_len else np.nan
    return out


def view_apply(func, x, w, s):          # windows.py:20-95 (count windows)
    n = (len(x) - w) // s + 1
    return np.array([func(x[i * s:i * s + w]) for i in range(n)])


def skew_g1(x):                         # stats.py:97-110
    s = np.std(x)
    if s == 0:
        return 0.0
    return float(np.mean((x - np.mean(x)) ** 3) / s ** 3)


def kurt_b2(x):                         # stats.py:113-126 (non-excess)
    v = np.var(x)
    if v == 0:
        return 0.0
    return float(np.mean((x - np.mean(x)) ** 4) / v ** 2)


def sampen_pairs(x, mm=2, r_factor=0.2):
    """Template-pair-count sample entropy (the definition the reference's
    run-length algorithm computes; equivalence asserted below)."""
    n = len(x)
    r = r_factor * np.std(x)
    last = n - mm - 1
    a = b = 0
    for u in range(last + 1):
        for v in range(u + 1, last + 1):
            if max(abs(x[u + k] - x[v + k]) for k in range(mm)) < r:
                b += 1
                if abs(x[u + mm] - x[v + mm]) < r:
                    a += 1
    return -math.log(a / b) if a and b else float("nan")


def sampen_runlength(x, mm=2, r_factor=0.2):
    """Streak-based formulation (information.py:23-113 semantics),
    written independently: for every pair offset, walk the diagonal and
    count streaks of matching samples."""
    n = len(x)
    r = r_factor * np.std(x)
    a = b = 0
    for off in range(1, n):            # v - u = off
        streak = 0
        for u in range(n - off):
            if abs(x[u] - x[u + off]) < r:
                streak += 1
            else:
                streak = 0
            # a match ENDING at (u, u+off) of length >= L contributes to
            # templates of length L; reference bounds: end index < n for
            # A (len mm+1), end < n-1 for B (len mm), then B shifts down
            if streak >= mm + 1:
                a += 1
            if streak >= mm and u + off < n - 1:
                b += 1
    return -math.log(a / b) if a and b else float("nan")


def dfa(x, windows, o=1, overlap=0):       # timedom.py:196-235
    xp = np.cumsum(x - np.mean(x))
    fs = []
    for w in windows:
        s = max(int(w * (100 - overlap) / 100), 1)
        nwin = (len(xp) - w) // s + 1
        rms = []
        for k in range(nwin):
            seg = xp[k * s:k * s + w]
            res = np.polyfit(np.arange(w), seg, o, full=True)[1]
            ssr = res[0] if len(res) else 0.0
            rms.append(math.sqrt(ssr / w))
        fs.append(np.nanmean(rms))
    return float(np.polyfit(np.log(windows), np.log(fs), 1)[0])


def jlist(a):
    return [None if (isinstance(v, float) and math.isnan(v)) else v
            for v in (a.tolist() if isinstance(a, np.ndarray) else a)]


def main():
    os.makedirs(OUT, exist_ok=True)

    # ---- gen.json: generator parity ----
    docs = []
    for i in [0, 1, 2, 3, 7, 99, 12345]:
        t = tokens(i)
        docs.append(dict(i=i, doc_id="doc_%08d" % i, n_tok=int(len(t)),
                         source=source(i), tokens_head=t[:16].tolist(),
                         tok_sum=int(t.sum()), tok_min=int(t.min()),
                         tok_max=int(t.max())))
    skew = [dict(i=i, n_tok=n_tok(i, skewed=True)) for i in range(300)
            if h2(99, i) % 100 == 0]
    json.dump(dict(docs=docs, skewed=skew),
              open(f"{OUT}/gen.json", "w"), indent=1)

    # ---- stats.json: on doc 3 tokens as float ----
    x = tokens(3).astype(float)
    p25, p75 = np.percentile(x, 25), np.percentile(x, 75)
    const = np.full(10, 5.0)
    ties = np.array([3.0, 1.0, 2.0, 3.0, 1.0])
    # mode, smallest-value tie-break (stats.py:62-94)
    vals, cnts = np.unique(ties, return_counts=True)
    mode_ties = float(vals[np.argmax(cnts)])
    ent_x = tokens(5)[:64].astype(float) + 1.0
    json.dump(dict(
        n=int(len(x)), mean=float(np.mean(x)), var_pop=float(np.var(x)),
        std_pop=float(np.std(x)), skew_g1=skew_g1(x), kurt_b2=kurt_b2(x),
        kurt_excess=kurt_b2(x) - 3.0, iqr=float(p75 - p25),
        median=float(np.median(x)), p25=float(p25), p75=float(p75),
        drange=float(x.max() - x.min()),
        coeff_var=float(np.std(x) / np.mean(x)),
        const_skew=skew_g1(const), const_kurt=kurt_b2(const),
        const_kurt_excess=kurt_b2(const) - 3.0,
        mode_ties=mode_ties,
        entropy_n=int(len(ent_x)), entropy=entropy(ent_x),
    ), open(f"{OUT}/stats.json", "w"), indent=1)

    # ---- timedom.json: on first 256 tokens of doc 1, centered ----
    x = tokens(1)[:256].astype(float)
    xc = x - np.mean(x)
    g = gradient(x)
    act, mob, comp = hjorth(x)
    A, b = o1fit(np.arange(len(x), dtype=float), x)
    ma5, ma4 = moving_average(x, 5), moving_average(x, 4)
    ss8 = slope_sum(x, 8)
    json.dump(dict(
        n=int(len(x)),
        gradient_head=g[:8].tolist(), gradient_tail=g[-3:].tolist(),
        gradient_sum=float(g.sum()),
        zero_cross_count=int(zero_crossings(xc).sum()),
        zero_cross_count_th100=int(zero_crossings(xc, 100.0).sum()),
        line_length=float(np.sum(np.abs(np.diff(x)))),
        hjorth_activity=act, hjorth_mobility=mob, hjorth_complexity=comp,
        hurst=hurst(x), o1fit_A=A, o1fit_b=b,
        ma5_head=ma5[:8].tolist(), ma5_tail=ma5[-3:].tolist(),
        ma5_sum=float(ma5.sum()),
        ma4_head=ma4[:8].tolist(), ma4_tail=ma4[-3:].tolist(),
        ma4_sum=float(ma4.sum()),
        ss8_head=ss8[:12].tolist(), ss8_tail=ss8[-3:].tolist(),
        ss8_sum=float(ss8.sum()),
        pt_diff_head=(x[:8] / 8).tolist(),
        n_peaks=int(np.sum((x[1:-1] > x[:-2]) & (x[1:-1] > x[2:]))),
    ), open(f"{OUT}/timedom.json", "w"), indent=1)

    # ---- hrv.json: nni in ms from doc 4 ----
    nni = 800.0 + (tokens(4)[:300] % 400).astype(float)
    d = np.diff(nni)
    sd1 = np.std(d) / math.sqrt(2)
    s2 = nni[1:] + nni[:-1]
    sd2 = np.std(s2) / math.sqrt(2)
    index = np.cumsum(nni) * 1e6          # ms -> ns (td_factor('ms'))
    seg_means = nonuniform_apply(np.mean, index.astype(int), nni,
                                 30e9, 30e9)
    seg_stds = nonuniform_apply(np.std, index.astype(int), nni,
                                30e9, 30e9)
    json.dump(dict(
        n=int(len(nni)), nni_head=nni[:8].tolist(),
        sdnn=float(np.std(nni)),
        rmssd=float(np.sqrt(np.mean(d ** 2))),
        ssd=float(np.sum(d)), sdsd=float(np.std(d)),
        pnn50=float(np.sum(np.abs(d) > 50) / (len(nni) - 1)),
        csi_sd1=float(sd1), csi_sd2=float(sd2),
        lorenz_csi=float(sd1 / sd2),
        lorenz_cvi=float(np.log10(sd1 * sd2)),
        lorenz_mcsi=float(sd1 ** 2 / sd2),
        n_segments=int(len(seg_means)),
        sdann=float(np.std(seg_means)), sdnni=float(np.mean(seg_stds)),
        seg_means_head=jlist(seg_means[:6]),
    ), open(f"{OUT}/hrv.json", "w"), indent=1)

    # ---- windows.json: non-uniform index on doc 2 ----
    t2 = tokens(2)
    gaps = 1 + (t2 % 97)
    ts = np.cumsum(gaps).astype(int)      # strictly increasing, gappy
    vals = t2.astype(float)
    nu_mean = nonuniform_apply(np.mean, ts, vals, 500, 250,
                               min_window_len=3)
    nu_std = nonuniform_apply(np.std, ts, vals, 500, 250,
                              min_window_len=3)
    cw_mean = view_apply(np.mean, vals, 16, 8)
    idx = get_indices(ts, 500, 250)
    json.dump(dict(
        n=int(len(vals)), ts_head=ts[:8].tolist(),
        wsize=500, wstep=250, min_window_len=3,
        n_windows=int(idx.shape[1]),
        counts=(idx[1] - idx[0]).tolist(),
        nu_mean=jlist(nu_mean), nu_std=jlist(nu_std),
        cw_w=16, cw_s=8, cw_n=int(len(cw_mean)),
        cw_mean=jlist(cw_mean),
    ), open(f"{OUT}/windows.json", "w"), indent=1)

    # ---- signal.json: sampen on doc 6 ----
    xs = tokens(6)[:200].astype(float)
    se_pairs = sampen_pairs(xs)
    se_runs = sampen_runlength(xs)
    assert abs(se_pairs - se_runs) < 1e-12, (se_pairs, se_runs)
    xs2 = 800.0 + (tokens(6)[:200] % 50).astype(float)  # smoother series
    xd = tokens(1)[:256].astype(float)
    json.dump(dict(
        n=int(len(xs)), sampen=se_pairs,
        sampen_smooth=sampen_pairs(xs2),
        std_pop=float(np.std(xs)),
        dfa_windows=[4, 8, 16, 32, 64],
        dfa_exponent=dfa(xd, [4, 8, 16, 32, 64]),
        dfa_overlap50=dfa(xd, [8, 16, 32], overlap=50),
    ), open(f"{OUT}/signal.json", "w"), indent=1)

    # ---- spectral.json: FFT goldens + DIRECT non-uniform DFT oracle ----
    xq = tokens(9)[:256].astype(float)
    xc = xq - xq.mean()
    F = np.fft.fft(xc)
    nn = len(xc) // 2
    freqs = np.fft.fftfreq(len(xc), d=1.0 / 128)[:nn]  # fs = 128
    psd = np.abs(F)[:nn]
    # NUFFT oracle: exact direct sum (independent of the fast algorithm)
    t2 = tokens(2)[:128]
    xs_nu = np.cumsum(1 + (t2 % 97)).astype(float) * 0.001
    c_nu = t2.astype(float) - t2.astype(float).mean()
    M = 64
    ks = np.arange(-(M // 2), M - (M // 2)).astype(float)
    Fd = np.array([np.sum(c_nu * np.exp(1j * k * xs_nu)) for k in ks])
    Fd /= len(xs_nu)
    json.dump(dict(
        n=int(len(xc)), fs=128,
        fft_re_head=F.real[:8].tolist(), fft_im_head=F.imag[:8].tolist(),
        psd_sum=float(np.abs(F).sum()),
        band_power_5_15=float(np.sum(psd[(freqs >= 5) & (freqs <= 15)])),
        peak_freq_5_15=float(freqs[
            np.searchsorted(freqs, 5) + int(np.argmax(
                psd[np.searchsorted(freqs, 5):
                    np.searchsorted(freqs, 15)]))]),
        rel_power_5_15=float(np.sum(psd[(freqs >= 5) & (freqs <= 15)])
                             / np.abs(F).sum()),
        psd_half_sum=float(psd.sum()),
        rel_power_half_5_15=float(
            np.sum(psd[(freqs >= 5) & (freqs <= 15)]) / psd.sum()),
        nufft_n=int(len(xs_nu)), nufft_m=M,
        nufft_re=Fd.real.tolist(), nufft_im=Fd.imag.tolist(),
        nufft_abs=np.abs(Fd).tolist(),
    ), open(f"{OUT}/spectral.json", "w"), indent=1)

    print("fixtures written to", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
