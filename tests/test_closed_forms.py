"""Pure-math property tests for the closed-form identities the engine
relies on — no Spark session, arbitrary Hypothesis inputs. Each of
these identities replaces an iterative or pairwise computation with a
window/aggregate shape; the fixture-based tests in test_wave*.py check
them on real data, these check them on adversarial data (empty runs,
all-ties, saturating values) that fixtures may never contain.

- clamped balance (LG2):  max(0, x+d) recursion == P − min(0, runmin P)
- largest-remainder (LG1): conservation + per-item error < 1 cent
- decile cut (MO5):        floor((rank−1)k/N) == balanced partitions
- Gini rank identity (R9): Σ(2r−n−1)x / (nΣx) == mean-abs-difference
  form, with zero-count items needing no rank
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=1000), max_size=50))
def test_clamped_balance_closed_form(deltas):
    """x_t = max(0, x_{t-1} + d_t)  ==  P_t − min(0, min_{s≤t} P_s)."""
    x = 0
    prefix = 0
    runmin = 0
    for d in deltas:
        x = max(0, x + d)
        prefix += d
        runmin = min(runmin, prefix)
        assert x == prefix - min(0, runmin)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=20),
    st.integers(min_value=0, max_value=10**9),
)
def test_largest_remainder_conserves_and_bounds(weights, total):
    """Largest-remainder proration: allocations sum EXACTLY to the
    total, and every item's allocation is within 1 unit of its ideal
    fractional share."""
    s = sum(weights)
    base = [total * w // s for w in weights]
    rem = [(total * w % s, i) for i, w in enumerate(weights)]
    leftover = total - sum(base)
    assert 0 <= leftover < len(weights) or leftover == 0
    for _, i in sorted(rem, key=lambda t: (-t[0], t[1]))[:leftover]:
        base[i] += 1
    assert sum(base) == total
    for w, got in zip(weights, base):
        ideal = total * w / s
        assert abs(got - ideal) < 1.0


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=5000),
    st.integers(min_value=1, max_value=20),
)
def test_decile_cut_is_balanced(n, k):
    """floor((rank−1)·k/N) yields k contiguous buckets (when N ≥ k)
    whose sizes differ by at most 1 — ntile's tie-free twin."""
    sizes = [0] * k
    for rank in range(1, n + 1):
        b = (rank - 1) * k // n
        sizes[b] += 1
    nonzero = [s for s in sizes if s > 0]
    if n >= k:
        assert all(s > 0 for s in sizes)
    assert max(nonzero) - min(nonzero) <= 1
    # contiguity: bucket is monotone in rank (floor of increasing arg)
    assert sizes == sorted(sizes, key=lambda _: 0)  # trivially ordered


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40)
)
def test_gini_rank_identity_equals_mad_form(counts):
    """Σ(2rᵢ−n−1)xᵢ / (n·Σx)  ==  Σᵢⱼ|xᵢ−xⱼ| / (2n²·mean) — and
    zero-count items contribute nothing to the numerator, so ranking
    only the nonzero tail (with a rank offset) gives the same value."""
    n = len(counts)
    total = sum(counts)
    if total == 0:
        return
    xs = sorted(counts)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    gini_rank = num / (n * total)
    mad = sum(abs(a - b) for a in counts for b in counts)
    gini_mad = mad / (2 * n * total)
    assert abs(gini_rank - gini_mad) < 1e-9
    # the zero-skip trick: rank only nonzero items, offset by #zeros
    nz = sorted(c for c in counts if c > 0)
    zeros = n - len(nz)
    num2 = sum((2 * (zeros + j + 1) - n - 1) * x for j, x in enumerate(nz))
    assert num2 == num


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # observed time
            st.booleans(),  # event (True) vs censored (False)
        ),
        min_size=1,
        max_size=60,
    )
)
def test_km_at_risk_suffix_sum_identity(subjects):
    """q_survival_km's histogram suffix-sum at-risk counts equal the
    direct per-time recount, and the KM product is monotone in [0, 1]."""
    from collections import Counter

    hist = Counter(t for t, _ in subjects)
    total = len(subjects)
    surv = 1.0
    prev = 1.0
    running_before = 0
    for t in sorted(hist):
        n_risk_suffix = total - running_before
        n_risk_direct = sum(1 for ot, _ in subjects if ot >= t)
        assert n_risk_suffix == n_risk_direct
        d = sum(1 for ot, e in subjects if ot == t and e)
        if d:
            surv *= (1.0 - d / n_risk_suffix) if n_risk_suffix > d else 0.0
            assert 0.0 <= surv <= prev
            prev = surv
        running_before += hist[t]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # score bucket
            st.integers(min_value=0, max_value=10**6),  # id (unique-ified)
        ),
        min_size=1,
        max_size=80,
    )
)
def test_bucketed_global_rank_identity(rows):
    """q_decile_lift's rank = bucket-offset + within-bucket row_number
    equals the rank from one global sort by (score desc, id asc)."""
    rows = list({(s, i) for s, i in rows})  # unique (score, id) pairs
    global_order = sorted(rows, key=lambda r: (-r[0], r[1]))
    global_rank = {r: i + 1 for i, r in enumerate(global_order)}
    from collections import defaultdict

    buckets = defaultdict(list)
    for r in rows:
        buckets[r[0]].append(r)
    offset = 0
    for b in sorted(buckets, reverse=True):
        for j, r in enumerate(
            sorted(buckets[b], key=lambda r: (-r[0], r[1])), 1
        ):
            assert offset + j == global_rank[r]
        offset += len(buckets[b])


# --- PassJoin pigeonhole coverage (operators/dedup.passjoin_candidates) ----


def _edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _passjoin_covered(q: str, s: str, t: int, max_sig_len: int) -> bool:
    """Pure-python mirror of passjoin_candidates' emission rules: does
    probe q generate a (position, gram) that meets partner s's segment
    emission under the join's |Δp| <= t and |Δlen| <= t filters?"""
    nseg = t + 1
    M, L = len(q), len(s)
    if abs(M - L) > t:
        return False  # the operator's length filter would drop it anyway
    if L < nseg:
        return True  # short path: plain length-filtered block join
    # partner segments (even partition)
    segs = []
    base, rem = divmod(L, nseg)
    for i in range(nseg):
        p_i = i * base + min(i, rem)
        l_i = base + (1 if i < rem else 0)
        segs.append((p_i, s[p_i : p_i + l_i]))
    # probe substring lengths
    glo = max(nseg, M - t)
    ghi = min(M + t, max_sig_len)
    lmin = glo // nseg
    lmax = min((ghi + nseg - 1) // nseg, M)
    if lmax < lmin:
        return False
    for p_i, seg in segs:
        gl = len(seg)
        if gl < lmin or gl > lmax:
            continue
        for p in range(0, M - gl + 1):
            if abs(p - p_i) <= t and q[p : p + gl] == seg:
                return True
    return False


@settings(max_examples=500, deadline=None)
@given(
    st.text(alphabet="ab ", max_size=24),
    st.text(alphabet="ab ", max_size=24),
    st.integers(min_value=1, max_value=6),
)
def test_passjoin_pigeonhole_covers_all_close_pairs(q, s, t):
    """Soundness of the blocking: every pair within edit distance t must
    be generated as a candidate (the verify step only REMOVES pairs)."""
    if _edit_distance(q, s) <= t:
        assert _passjoin_covered(q, s, t, max_sig_len=24)
