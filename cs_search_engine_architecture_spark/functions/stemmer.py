"""Pure-Python Porter2 (Snowball English) stemmer.

The reference engine stems with the vendored Snowball C library
(``sea/util/fast_stemmer.pyx:23-27``) but then *discards the stem text* and
only uses its length to truncate the original token
(``sea/tokenizer.pyx:138-139``): ``token[:len(stem(token))]``. We therefore
need a faithful Snowball English implementation whose *stem lengths* match
libstemmer. This module implements the published Porter2 algorithm
(https://snowballstem.org/algorithms/english/stemmer.html) including the
exceptional-form lists, and exposes :func:`stem` plus the reference's
truncation behaviour via :func:`stem_truncate`.

No third-party stemmer package exists in this environment; this is a public
algorithm re-implemented from its specification.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms, applied to the whole word before the algorithm.
_EXCEPTION1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Words to stop processing after step 1a.
_EXCEPTION2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _compute_r1_r2(word: str) -> tuple[int, int]:
    n = len(word)
    r1 = n
    # special prefixes fix R1 right after them
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable."""
    n = len(word)
    if n == 2:
        # vowel at the beginning of the word followed by a non-vowel
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        # non-vowel, vowel, non-vowel other than w, x, Y
        return (
            not _is_vowel(word, n - 3)
            and _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 1)
            and word[n - 1] not in "wxY"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _contains_vowel(word: str) -> bool:
    return any(c in _VOWELS for c in word)


@lru_cache(maxsize=1 << 17)
def stem(word: str) -> str:
    """Snowball English stem of ``word`` (expects lowercase input)."""
    if len(word) <= 2:
        return word

    exceptional = _EXCEPTION1.get(word)
    if exceptional is not None:
        return exceptional

    # remove initial apostrophe, mark consonant-y as Y
    if word.startswith("'"):
        word = word[1:]
        if len(word) <= 2:
            return word
    if "y" in word:
        chars = list(word)
        if chars[0] == "y":
            chars[0] = "Y"
        for i in range(1, len(chars)):
            # left-to-right on the transformed prefix: a y turned into Y is
            # a consonant and does not trigger marking of the next y
            if chars[i] == "y" and chars[i - 1] in _VOWELS:
                chars[i] = "Y"
        word = "".join(chars)

    r1, r2 = _compute_r1_r2(word)

    # Step 0: longest of ', 's, 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        # delete if the preceding word part contains a vowel not
        # immediately before the s
        if any(c in _VOWELS for c in word[:-2]):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # Step 1b
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # Step 1c: y/Y -> i if preceded by a non-vowel which is not the first
    # letter of the word
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (search in R1)
    step2 = (
        ("ization", "ize"),
        ("ational", "ate"),
        ("fulness", "ful"),
        ("ousness", "ous"),
        ("iveness", "ive"),
        ("tional", "tion"),
        ("biliti", "ble"),
        ("lessli", "less"),
        ("entli", "ent"),
        ("ation", "ate"),
        ("alism", "al"),
        ("aliti", "al"),
        ("ousli", "ous"),
        ("iviti", "ive"),
        ("fulli", "ful"),
        ("enci", "ence"),
        ("anci", "ance"),
        ("abli", "able"),
        ("izer", "ize"),
        ("ator", "ate"),
        ("alli", "al"),
        ("bli", "ble"),
        ("ogi", None),  # -> og if preceded by l
        ("li", None),  # delete if preceded by valid li-ending
    )
    for suf, repl in step2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if len(word) > 3 and word[-4] == "l":
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 3 (search in R1; 'ative' requires R2)
    step3 = (
        ("ational", "ate"),
        ("tional", "tion"),
        ("alize", "al"),
        ("icate", "ic"),
        ("iciti", "ic"),
        ("ative", ""),
        ("ical", "ic"),
        ("ness", ""),
        ("ful", ""),
    )
    for suf, repl in step3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 4 (search in R2)
    step4 = (
        "ement",
        "ance",
        "ence",
        "able",
        "ible",
        "ment",
        "ant",
        "ent",
        "ism",
        "ate",
        "iti",
        "ous",
        "ive",
        "ize",
        "ion",
        "al",
        "er",
        "ic",
    )
    for suf in step4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


def stem_truncate(token: str) -> str:
    """The reference's stemming quirk: truncate the *original* token to the
    length of its Snowball stem (``sea/tokenizer.pyx:138-139`` uses only the
    stem length returned by ``fast_stemmer.pyx:23-27``).

    e.g. ``happy`` -> stem ``happi`` (len 5) -> ``happy``;
    ``tokenizer`` -> stem ``token`` (len 5) -> ``token``.
    """
    return token[: len(stem(token))]
