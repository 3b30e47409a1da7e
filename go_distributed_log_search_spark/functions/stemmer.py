"""Porter stemmers — the ``en_stem`` tokenizer's stemming stage.

Reference parity target: /root/reference/src/config/mod.go:53-58 declares
``en_stem`` per text field; Bluge applies a snowball English (Porter2)
stemmer at index time (src/commands/index.go:174). Two implementations,
both from public specs:

- ``porter_stem`` — the classic algorithm (M.F. Porter, "An algorithm for
  suffix stripping", Program 14(3), 1980), kept for comparison/tests;
- ``porter2_stem`` — the snowball "english" revision (snowballstem.org
  spec): y-marking, R1/R2 regions with gener/commun/arsen prefixes,
  exceptional forms, revised suffix tables. This is what ``en_stem``
  uses, closing the round-2/3 "classic-Porter approximation" delta.

Execution shape: pure-Python per token, applied inside an Arrow-batched
pandas UDF over the token ARRAY column — one Python roundtrip per batch,
never per row (north-rule hot-path constraint). ``en_stem`` only runs for
fields whose schema declares it; the pipeline hot path uses ``default``.
"""

from __future__ import annotations


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel-group->consonant-group
    transitions."""
    m = 0
    prev_cons = None
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if prev_cons is False and cons:
            m += 1
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_cons(stem, len(stem) - 1)
    )


def _ends_cvc(stem: str) -> bool:
    """*o: ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(stem) < 3:
        return False
    return (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
        and stem[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and the remaining stem has m > min_m,
    return stem+repl, else None."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word  # suffix matched but condition failed: rule consumed


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Classic Porter stem of a lowercase word."""
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    did_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            did_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            did_1b = True
    if did_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0), longest match first by scan order
    for suf, repl in _STEP2:
        if w.endswith(suf):
            w = _replace(w, suf, repl, 0)
            break

    # step 3 (m > 0)
    for suf, repl in _STEP3:
        if w.endswith(suf):
            w = _replace(w, suf, repl, 0)
            break

    # step 4 (m > 1); (s|t)ion keeps the s/t
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


# ------------------------------------------------------------- Porter2
# The snowball "english" stemmer (M.F. Porter, snowballstem.org spec —
# public knowledge), i.e. exactly what Bluge applies for `en_stem`
# (reference: src/config/mod.go:53-58 -> blevesearch snowball en).
# Differences from the classic algorithm above: y-marking, R1/R2 regions
# (with gener/commun/arsen prefixes), exceptional forms, the ied/ies and
# li rules, and revised step-2/3/4 suffix tables.

_P2_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_P2_EXC2 = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}
_P2_VOWELS = frozenset("aeiouy")  # on the marked word, 'Y' is a consonant
_P2_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_P2_LI_OK = frozenset("cdeghkmnrt")

_P2_STEP2 = [  # longest-match order; None repl = conditional rule
    ("ational", "ate"), ("fulness", "ful"), ("ousness", "ous"),
    ("iveness", "ive"), ("ization", "ize"),
    ("tional", "tion"), ("biliti", "ble"), ("lessli", "less"),
    ("entli", "ent"), ("fulli", "ful"), ("ousli", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("alism", "al"), ("ation", "ate"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"), ("izer", "ize"),
    ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]
_P2_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]
_P2_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
]


def _p2_mark(word: str) -> str:
    """Mark consonant-y as 'Y': initial y, or y after a vowel."""
    out = []
    for i, c in enumerate(word):
        if c == "y" and (i == 0 or word[i - 1] in _P2_VOWELS):
            out.append("Y")
        else:
            out.append(c)
    return "".join(out)


def _p2_std_region(w: str, start: int) -> int:
    """Position after the first non-vowel following a vowel, at/after
    ``start``; len(w) if none."""
    for i in range(start + 1, len(w)):
        if w[i] not in _P2_VOWELS and w[i - 1] in _P2_VOWELS:
            return i + 1
    return len(w)


def _p2_regions(w: str) -> tuple[int, int]:
    r1 = None
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    if r1 is None:
        r1 = _p2_std_region(w, 0)
    r2 = _p2_std_region(w, r1)
    return r1, r2


def _p2_short_syllable_end(w: str) -> bool:
    """Ends in a short syllable: non-vowel + vowel + non-vowel(not w/x/Y),
    or the 2-letter word-start vowel + non-vowel."""
    n = len(w)
    if n >= 3 and (
        w[-3] not in _P2_VOWELS
        and w[-2] in _P2_VOWELS
        and w[-1] not in _P2_VOWELS
        and w[-1] not in "wxY"
    ):
        return True
    return n == 2 and w[0] in _P2_VOWELS and w[1] not in _P2_VOWELS


def porter2_stem(word: str) -> str:
    """Porter2 / snowball-english stem of a lowercase word."""
    if len(word) <= 2:
        return word
    if word in _P2_EXC1:
        return _P2_EXC1[word]

    w = _p2_mark(word)
    r1, r2 = _p2_regions(w)

    def in_r1(suffix: str) -> bool:
        return len(w) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(w) - len(suffix) >= r2

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) - 3 > 1 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(c in _P2_VOWELS for c in w[:-2]):
            w = w[:-1]
    if w in _P2_EXC2:
        return w

    # step 1b
    for suf in ("eedly", "eed", "ingly", "edly", "ing", "ed"):
        if not w.endswith(suf):
            continue
        if suf in ("eedly", "eed"):
            if in_r1(suf):
                w = w[: len(w) - len(suf)] + "ee"
        else:
            stem = w[: len(w) - len(suf)]
            if any(c in _P2_VOWELS for c in stem):
                w = stem
                if w.endswith(("at", "bl", "iz")):
                    w += "e"
                elif w.endswith(_P2_DOUBLES):
                    w = w[:-1]
                elif len(w) == r1 and _p2_short_syllable_end(w):
                    w += "e"
        break

    # step 1c: y/Y -> i after a non-vowel that is not the first letter
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in _P2_VOWELS
    ):
        w = w[:-1] + "i"

    # step 2 (longest suffix; action only when in R1)
    for suf, repl in _P2_STEP2:
        if not w.endswith(suf):
            continue
        if in_r1(suf):
            if suf == "ogi":
                if w.endswith("logi"):
                    w = w[:-1]
            elif suf == "li":
                if len(w) > 2 and w[-3] in _P2_LI_OK:
                    w = w[:-2]
            else:
                w = w[: len(w) - len(suf)] + repl
        break

    # step 3
    for suf, repl in _P2_STEP3:
        if not w.endswith(suf):
            continue
        if in_r1(suf):
            if suf == "ative":
                if in_r2(suf):
                    w = w[:-5]
            else:
                w = w[: len(w) - len(suf)] + repl
        break

    # step 4 (in R2; (s|t)ion)
    for suf in _P2_STEP4:
        if not w.endswith(suf):
            continue
        if in_r2(suf):
            stem = w[: len(w) - len(suf)]
            if suf != "ion" or stem.endswith(("s", "t")):
                w = stem
        break

    # step 5
    if w.endswith("e"):
        if in_r2("e") or (in_r1("e") and not _p2_short_syllable_end(w[:-1])):
            w = w[:-1]
    elif w.endswith("ll") and in_r2("l"):
        w = w[:-1]

    return w.replace("Y", "y")
