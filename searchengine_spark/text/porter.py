"""Porter stemming algorithm (Porter, 1980) — pure Python.

Implements the classic 5-step suffix-stripping algorithm from
M.F. Porter, "An algorithm for suffix stripping", Program 14(3),
1980. The reference engine stems with NLTK's PorterStemmer
(/root/reference/searchenginespark.py:57-62); NLTK is not available
in this environment, so we implement the published algorithm
directly.

Two modes:

- ``porter_stem(word)`` — the original published algorithm; the
  engine default (oracle-friendly, matches the paper's test vectors).
- ``porter_stem(word, mode="nltk")`` — reproduces NLTK's
  PorterStemmer default (NLTK_EXTENSIONS) behavior, used by the
  NLTK-parity tokenizer (text/nltk_parity.py). The extensions are
  enumerated in NLTK's public source (nltk/stem/porter.py): an
  irregular-forms pool (skies->sky, dying->die, ...), ies/ied
  handling for 4-letter words (dies->die not di), a
  consonant-before-y condition in step 1c (enjoy->enjoy, happy->
  happi), apply-ALLI-first recursion, the BLI->BLE departure
  (possibly->possibl) and a FULLI->FUL rule in step 2.

This module is driver-side pure Python; at scale it only ever runs
inside an Arrow-batched pandas_udf (see tokenizer.stem_tokens_udf),
never as a row-at-a-time UDF.
"""

from __future__ import annotations

VOWELS = "aeiou"

# NLTK_EXTENSIONS irregular-forms pool (nltk/stem/porter.py): these
# words bypass the algorithm entirely.
_NLTK_POOL = {
    "sky": "sky", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "news": "news",
    "innings": "inning", "inning": "inning",
    "outings": "outing", "outing": "outing",
    "cannings": "canning", "canning": "canning",
    "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
}


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _m(stem: str) -> int:
    """Porter measure: number of VC sequences in [C](VC){m}[V]."""
    forms = []
    for i in range(len(stem)):
        f = "c" if _is_consonant(stem, i) else "v"
        if not forms or forms[-1] != f:
            forms.append(f)
    s = "".join(forms)
    return s.count("vc")


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    return (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace_suffix(word: str, suffix: str, replacement: str) -> str:
    return word[: len(word) - len(suffix)] + replacement


def _step1a(word: str, nltk: bool = False) -> str:
    if nltk and word.endswith("ies") and len(word) == 4:
        return word[:-3] + "ie"  # dies->die, ties->tie (not di/ti)
    if word.endswith("sses"):
        return word[:-2]
    if word.endswith("ies"):
        return word[:-2]
    if word.endswith("ss"):
        return word
    if word.endswith("s"):
        return word[:-1]
    return word


def _step1b(word: str, nltk: bool = False) -> str:
    if nltk and word.endswith("ied"):
        return word[:-3] + ("ie" if len(word) == 4 else "i")  # died->die, denied->deni
    if word.endswith("eed"):
        stem = word[:-3]
        return word[:-1] if _m(stem) > 0 else word
    flag = False
    if word.endswith("ed"):
        stem = word[:-2]
        if _contains_vowel(stem):
            word, flag = stem, True
    elif word.endswith("ing"):
        stem = word[:-3]
        if _contains_vowel(stem):
            word, flag = stem, True
    if flag:
        if word.endswith(("at", "bl", "iz")):
            return word + "e"
        if _ends_double_consonant(word) and word[-1] not in "lsz":
            return word[:-1]
        if _m(word) == 1 and _ends_cvc(word):
            return word + "e"
    return word


def _step1c(word: str, nltk: bool = False) -> str:
    if word.endswith("y"):
        stem = word[:-1]
        if nltk:
            # NLTK condition: y preceded by a consonant that is not
            # the word's only other letter (happy->happi, enjoy->enjoy,
            # by->by) — replaces the original contains-vowel test.
            if len(stem) > 1 and _is_consonant(stem, len(stem) - 1):
                return stem + "i"
        elif _contains_vowel(stem):
            return stem + "i"
    return word


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _apply_rules(word: str, rules, min_m: int) -> str:
    for suffix, repl in rules:
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if _m(stem) > min_m - 1:
                return stem + repl
            return word
    return word


def _step4(word: str) -> str:
    for suffix in _STEP4:
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if suffix == "ion" and not stem.endswith(("s", "t")):
                return word
            if _m(stem) > 1:
                return stem
            return word
    return word


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        m = _m(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return word


def _step5b(word: str) -> str:
    if _m(word) > 1 and word.endswith("ll"):
        return word[:-1]
    return word


from functools import lru_cache


# NLTK's default mode replaces the paper's ABLI->ABLE rule with the
# Porter-website departure BLI->BLE (possibly->possibl like NLTK, not
# possibli), and appends FULLI->FUL.
_STEP2_NLTK = tuple(
    ("bli", "ble") if rule == ("abli", "able") else rule for rule in _STEP2
) + (("fulli", "ful"),)


def _step2(word: str, nltk: bool = False) -> str:
    if nltk and word.endswith("alli") and _m(word[:-4]) > 0:
        # NLTK applies ALLI->AL first and re-runs step 2 on the result
        # (ationalli -> ational -> ate).
        return _step2(word[:-4] + "al", nltk=True)
    return _apply_rules(word, _STEP2_NLTK if nltk else _STEP2, 1)


@lru_cache(maxsize=1 << 18)
def porter_stem(word: str, mode: str = "original") -> str:
    """Stem one lowercase word with the Porter algorithm.

    ``mode="original"`` follows the 1980 paper; ``mode="nltk"``
    reproduces NLTK PorterStemmer's default NLTK_EXTENSIONS behavior
    (see module docstring) for reference token-for-token parity.

    Memoized: corpora repeat a small vocabulary across a huge token
    stream, so the per-executor cache turns stemming into a dict hit
    for all but the first occurrence of each word.
    """
    nltk = mode == "nltk"
    if nltk:
        pooled = _NLTK_POOL.get(word)
        if pooled is not None:
            return pooled
    if len(word) <= 2:
        return word
    word = _step1a(word, nltk)
    word = _step1b(word, nltk)
    word = _step1c(word, nltk)
    word = _step2(word, nltk)
    word = _apply_rules(word, _STEP3, 1)
    word = _step4(word)
    word = _step5a(word)
    word = _step5b(word)
    return word


def sql_stem_case_expr(
    words, var: str = "w", *, mode: str = "original"
) -> str:
    """DuckDB CASE expression mapping each known word to its Porter
    stem — the SQL-side stand-in for ``porter_stem``, which is not
    ANSI-SQL-expressible (and DuckDB's fts `stem()` can't load
    offline).

    The dictionary is generated FROM this module's golden-tested
    stemmer over a closed vocabulary, so the oracle checks the whole
    distributed pipeline (tokenize -> stem -> index -> score) against
    an independent engine, with only the per-word stem mapping shared.
    Any word outside the dictionary raises via DuckDB ``error()``:
    testdata vocabulary drift fails LOUDLY as an oracle error instead
    of silently hash-matching or mismatching.
    """
    cases = " ".join(
        f"WHEN '{w}' THEN '{porter_stem(w, mode=mode)}'"
        for w in sorted(set(words))
    )
    return (
        f"CASE {var} {cases} "
        f"ELSE error('no stem dictionary entry for: ' || {var}) END"
    )
