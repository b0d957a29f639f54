"""Porter stemmer — implemented from the published algorithm.

M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980.
This is the classic (original) Porter algorithm, the same algorithm
Lucene's ``PorterStemFilter`` implements; written from the paper's rule
tables, not translated from any existing implementation.

The stemmer operates on lowercase ASCII words.  Words of length <= 2 are
returned unchanged (as in the original).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    """True if word[i] is a consonant per Porter's definition.

    'y' is a consonant when it is the first letter or follows a vowel
    position that is itself a consonant.
    """
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m() — the number of VC sequences in the stem."""
    n = len(stem)
    i = 0
    # skip initial consonants
    while i < n and _is_cons(stem, i):
        i += 1
    m = 0
    while True:
        # skip vowels
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            return m
        # skip consonants — completing one VC
        while i < n and _is_cons(stem, i):
            i += 1
        m += 1
        if i >= n:
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
    """*o — stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    n = len(word)
    return (
        _is_cons(word, n - 1)
        and not _is_cons(word, n - 2)
        and _is_cons(word, n - 3)
        and word[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, m_min: int) -> str | None:
    """If word ends with suffix and m(stem) > m_min, replace it; else None."""
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > m_min:
        return stem + repl
    return None


# (suffix, replacement) rule tables from the paper.
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word

    # Step 1a: plurals
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        word = word[:-1]

    # Step 1b: -ed / -ing
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    else:
        flag = False
        if word.endswith("ed") and _has_vowel(word[:-2]):
            word = word[:-2]
            flag = True
        elif word.endswith("ing") and _has_vowel(word[:-3]):
            word = word[:-3]
            flag = True
        if flag:
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif _ends_double_cons(word) and word[-1] not in "lsz":
                word = word[:-1]
            elif _measure(word) == 1 and _ends_cvc(word):
                word += "e"

    # Step 1c: y -> i
    if word.endswith("y") and _has_vowel(word[:-1]):
        word = word[:-1] + "i"

    # Step 2 (m > 0)
    for suffix, repl in _STEP2:
        if word.endswith(suffix):
            new = _replace(word, suffix, repl, 0)
            if new is not None:
                word = new
            break

    # Step 3 (m > 0)
    for suffix, repl in _STEP3:
        if word.endswith(suffix):
            new = _replace(word, suffix, repl, 0)
            if new is not None:
                word = new
            break

    # Step 4 (m > 1); -ion requires preceding s or t
    for suffix in _STEP4:
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if _measure(stem) > 1:
                if suffix == "ion" and not stem.endswith(("s", "t")):
                    pass
                else:
                    word = stem
            break

    # Step 5a: remove trailing e
    if word.endswith("e"):
        m = _measure(word[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(word[:-1])):
            word = word[:-1]

    # Step 5b: -ll -> -l when m > 1
    if word.endswith("ll") and _measure(word[:-1]) > 1:
        word = word[:-1]

    return word
