

def test_basket_pairs_hot_basket_guard(spark):
    """The r6-verdict hot-basket hazard: one pathological mega-basket
    would emit C(k,2) pairs for its k items. basket_pairs must cap it
    at item_cap (keeping the globally most-frequent items,
    deterministically), leave sane baskets untouched, and keep total
    pair counts bounded."""
    from pyspark.sql import functions as F

    from moisturizer_spark.operators.frequent import basket_pairs

    # 200 sane baskets of 4 items over a 40-item catalog, plus one
    # pathological basket holding items 0..999
    sane = [(b, (b * 7 + i) % 40) for b in range(200) for i in range(4)]
    hot = [(9999, item) for item in range(1000)]
    df = spark.createDataFrame(sane + hot, "basket long, item long")
    pairs = basket_pairs(df, "basket", "item", item_cap=32)
    got = pairs.collect()
    # every pair's support is bounded and the hot basket contributed at
    # most C(32,2) = 496 pairs: total pairs <= sane-pair universe + 496
    sane_pairs = {
        (min(a, b), max(a, b))
        for bkt in range(200)
        for a in [(bkt * 7 + i) % 40 for i in range(4)]
        for b in [(bkt * 7 + j) % 40 for j in range(4)]
        if a != b
    }
    hot_contrib = [
        (r["item_a"], r["item_b"])
        for r in got
        if (r["item_a"], r["item_b"]) not in sane_pairs
    ]
    assert len(hot_contrib) <= 496, len(hot_contrib)
    # the cap keeps the MOST-FREQUENT items: every hot-basket survivor
    # is one of the catalog items (0..39, which appear in many sane
    # baskets), never a long-tail item (40..999, frequency 1)
    survivors = {i for p in hot_contrib for i in p}
    assert survivors and all(i < 40 for i in survivors), sorted(survivors)[:5]
    # exact accounting: catalog items all have global frequency 21
    # (20 sane + 1 hot), tie-broken by id, so the hot basket's
    # survivors are exactly items 0..31; sane-pair support is the
    # uncapped count plus 1 iff both items are hot survivors
    from collections import Counter

    want = Counter()
    for bkt in range(200):
        items = sorted({(bkt * 7 + i) % 40 for i in range(4)})
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                want[(items[x], items[y])] += 1
    assert survivors == set(range(32))
    got_all = {(r["item_a"], r["item_b"]): r["n_both"] for r in got}
    for k, v in want.items():
        bonus = 1 if k[0] < 32 and k[1] < 32 else 0
        assert got_all.get(k, 0) == v + bonus, (k, got_all.get(k), v, bonus)
