"""Porter stemmer unit tests — per-step rules from Porter 1980 plus
end-to-end stems (per-step paper examples continue through later steps,
e.g. differentli -> different -> differ via step 4)."""

from go_distributed_log_search_spark.functions.stemmer import porter_stem

CASES = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    # step 1b + cleanup
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "running": "run",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2 (then later steps where applicable)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # guards
    "ss": "ss", "is": "is", "in": "in", "a": "a",
}


def test_porter_vocabulary():
    bad = {w: (porter_stem(w), want) for w, want in CASES.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_idempotent_on_stems():
    for w in CASES.values():
        assert porter_stem(porter_stem(w)) == porter_stem(w)


# ------------------------------------------------------------- Porter2

P2_CASES = {
    # step 1a / ied-ies / s rules
    "caresses": "caress", "ponies": "poni", "ties": "tie", "cries": "cri",
    "gas": "gas", "this": "this",
    # exceptional forms + invariants
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "inning": "inning", "outing": "outing",
    "exceed": "exceed", "proceed": "proceed",
    # special R1 prefixes (Porter2-only behavior)
    "generate": "generat", "generates": "generat", "general": "general",
    "communism": "communism", "arsenic": "arsenic",
    # 1b cleanups
    "running": "run", "hopping": "hop", "hoping": "hope", "agreed": "agre",
    "knitting": "knit", "enjoying": "enjoy", "enjoyment": "enjoy",
    # step 2-5
    "rational": "ration", "happily": "happili", "happy": "happi",
    "hopeful": "hope", "hopefulness": "hope", "conspicuous": "conspicu",
    "electrical": "electr", "electriciti": "electr", "sensibiliti": "sensibl",
    "replacement": "replac", "runner": "runner", "cry": "cri", "by": "by",
    "say": "say",
}


def test_porter2_vocabulary():
    from go_distributed_log_search_spark.functions.stemmer import porter2_stem

    bad = {w: (porter2_stem(w), want) for w, want in P2_CASES.items()
           if porter2_stem(w) != want}
    assert not bad, bad


def test_porter2_idempotent():
    from go_distributed_log_search_spark.functions.stemmer import porter2_stem

    for w in P2_CASES.values():
        assert porter2_stem(porter2_stem(w)) == porter2_stem(w)
