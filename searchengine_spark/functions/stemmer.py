"""Porter stemmer — pure-Python implementation of the published Porter
(1980) algorithm including the author's official revisions (the variant
Snowball ships as its ``porter`` stemmer, which the reference engine uses
via org.tartarus.snowball.ext.PorterStemmer — reference:
preprocessing/TextProcessor.java:4, 83-91).

Implemented from the public algorithm definition ("An algorithm for suffix
stripping", M.F. Porter, Program 14(3) 1980, and the revision notes on the
Snowball site). Not derived from any implementation's source.

The engine calls :func:`stem` per distinct token inside an Arrow-batched
pandas UDF with memoization (vocabulary << token count, so the cache does
the vectorizing); see functions/text.py.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: number of vowel→consonant transitions."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    n = len(word)
    return (
        _is_cons(word, n - 3)
        and not _is_cons(word, n - 2)
        and _is_cons(word, n - 1)
        and word[-1] not in "wxy"
    )


# (suffix, replacement) lists for steps 2-4; first matching suffix wins,
# exactly like the algorithm's longest-match-within-step convention
# (the lists are ordered so no earlier entry is a suffix of a later one
# with a different outcome for the same word ending).
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"),
    # official revision: bli -> ble (replaces the paper's abli -> able)
    ("bli", "ble"),
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    # official revision: logi -> log
    ("logi", "log"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_match(word: str, pairs) -> tuple[str, str] | None:
    best = None
    for suffix, repl in pairs:
        if word.endswith(suffix) and (best is None or len(suffix) > len(best[0])):
            best = (suffix, repl)
    return best


@lru_cache(maxsize=1 << 20)
def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # Step 1c: (*v*) y -> i  (the Snowball porter variant keeps the
    # paper's stem-contains-a-vowel condition here)
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    m2 = _longest_match(w, _STEP2)
    if m2:
        stem_ = w[: len(w) - len(m2[0])]
        if _measure(stem_) > 0:
            w = stem_ + m2[1]

    # Step 3
    m3 = _longest_match(w, _STEP3)
    if m3:
        stem_ = w[: len(w) - len(m3[0])]
        if _measure(stem_) > 0:
            w = stem_ + m3[1]

    # Step 4
    m4 = _longest_match(w, [(s, "") for s in _STEP4])
    if m4:
        stem_ = w[: len(w) - len(m4[0])]
        if _measure(stem_) > 1:
            if m4[0] == "ion" and (not stem_ or stem_[-1] not in "st"):
                pass
            else:
                w = stem_

    # Step 5a
    if w.endswith("e"):
        stem_ = w[:-1]
        m = _measure(stem_)
        if m > 1 or (m == 1 and not _ends_cvc(stem_)):
            w = stem_

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
