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
