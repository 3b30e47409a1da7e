"""Property-based tests (hypothesis) over the pure kernels.

These target the module-level kernels directly — no Spark job per
example — so hypothesis can run hundreds of cases: the packing next-fit
invariants and the bloom filter's no-false-negative guarantee, the two
places where a subtle off-by-one silently corrupts a corpus build.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from go_distributed_log_search_spark.operators.dedup import bloom_positions
from go_distributed_log_search_spark.operators.packing import next_fit_assign

tokens_lists = st.lists(st.integers(min_value=0, max_value=500), max_size=200)
budgets = st.integers(min_value=1, max_value=300)


@given(tokens_lists, budgets)
@settings(max_examples=300, deadline=None)
def test_next_fit_invariants(tokens, budget):
    packs = next_fit_assign(tokens, budget)
    assert len(packs) == len(tokens)  # conservation: every item assigned
    if not tokens:
        return
    # pack ids start at 0 and increase by at most 1, in order
    assert packs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(packs, packs[1:]))
    # budget compliance: a pack's sum exceeds the budget only when the
    # pack is a single oversize item
    sums, counts = {}, {}
    for tok, p in zip(tokens, packs):
        sums[p] = sums.get(p, 0) + tok
        counts[p] = counts.get(p, 0) + 1
    for p, s in sums.items():
        assert s <= budget or counts[p] == 1
    # tightness (next-fit greediness): the first item of every new pack
    # would have overflowed the previous pack
    for i in range(1, len(tokens)):
        if packs[i] != packs[i - 1]:
            assert sums[packs[i - 1]] + tokens[i] > budget


@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=1, max_size=100, unique=True),
    st.integers(min_value=1, max_value=8),
    st.sampled_from([64, 128, 1024, 4096]),
)
@settings(max_examples=200, deadline=None)
def test_bloom_no_false_negatives(hashes, k, m_bits):
    h = np.array(hashes, dtype=np.int64)
    pos = bloom_positions(h, k, m_bits)
    assert pos.shape == (k * len(h),)
    assert (pos < m_bits).all()
    # build the bitset exactly as incremental_dedup's _build does
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    # probe exactly as _might_contain does: every inserted key must hit
    probe = bloom_positions(h, k, m_bits)
    hit = (bits[probe // 8] & (1 << (probe % 8)).astype(np.uint8)) != 0
    assert hit.reshape(k, -1).all(axis=0).all()


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_bloom_positions_deterministic(hashes):
    h = np.array(hashes, dtype=np.int64)
    a = bloom_positions(h, 4, 1024)
    b = bloom_positions(h, 4, 1024)
    assert (a == b).all()
