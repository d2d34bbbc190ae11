"""English analysis chain: Porter stemmer, possessive filter, ASCII folding.

``porter_stem`` is an independent implementation of the Porter algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980 —
public domain algorithm), matched to the behavior of the reference's
``analysis/common/.../en/PorterStemmer.java`` including its two documented
departures from the paper (``bli``→``ble`` instead of ``abli``→``able``,
and the added ``logi``→``log`` rule) and the buffer fine print:

* words of length <= 2 are returned unchanged (``stem(): k > k0+1``);
* step "1c" (y→i) requires a vowel in the stem (``vowelinstem()``);
* the final-``e`` and double-``l`` removals in the last step measure m()
  over the buffer BEFORE the ``e`` strip (``step6()`` sets ``j = k`` once).

The engine applies stemming at the VOCABULARY level: each Arrow batch is
dictionary-encoded anyway (indexer invert kernel), so the per-token cost
is one dict probe — the stemmer itself runs once per distinct surface
form per executor (lru_cache), exactly the economics of Lucene stemming
each term once per token but with the batch dedup in front.

``strip_possessive`` is EnglishPossessiveFilter.java (trailing ``'s`` /
``’s`` / ``＇s`` removal). ``english_filter`` composes the chain
the way ``EnglishAnalyzer.createComponents`` does after tokenization:
possessive strip -> (lowercase/stop already applied by the tokenizer
chain) -> Porter stem.

``ascii_fold`` is the ASCIIFoldingFilter.java analog for the accented
Latin range: NFKD-decompose and drop combining marks, plus the standard
non-decomposable mappings (``ae``/``oe`` ligatures, ``ø``, ``ß``, ``đ``,
``þ``); characters outside the folding table pass through.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _cons(b: str, i: int) -> bool:
    c = b[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _cons(b, i - 1)
    return True


def _measure(b: str, j: int) -> int:
    """m() over b[0..j] inclusive: number of vowel→consonant transitions."""
    n = 0
    i = 0
    while True:
        if i > j:
            return n
        if not _cons(b, i):
            break
        i += 1
    while True:
        while True:
            i += 1
            if i > j:
                return n
            if _cons(b, i):
                break
        n += 1
        while True:
            i += 1
            if i > j:
                return n
            if not _cons(b, i):
                break


def _has_vowel(b: str, j: int) -> bool:
    return any(not _cons(b, i) for i in range(j + 1))


def _doublec(b: str, k: int) -> bool:
    return k >= 1 and b[k] == b[k - 1] and _cons(b, k)


def _cvc(b: str, i: int) -> bool:
    if i < 2 or not _cons(b, i) or _cons(b, i - 1) or not _cons(b, i - 2):
        return False
    return b[i] not in "wxy"


# (suffix, replacement) rule tables; applied first-match-wins within a
# step, replacement subject to the step's m() condition on the stem.
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


@lru_cache(maxsize=1 << 16)
def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    b = w

    # step 1a: plurals
    if b.endswith("sses"):
        b = b[:-2]
    elif b.endswith("ies"):
        b = b[:-3] + "i"
    elif b.endswith("s") and not b.endswith("ss"):
        b = b[:-1]

    # step 1b: -eed / -ed / -ing
    if b.endswith("eed"):
        if _measure(b, len(b) - 4) > 0:
            b = b[:-1]
    else:
        stripped = None
        if b.endswith("ed") and _has_vowel(b, len(b) - 3):
            stripped = b[:-2]
        elif b.endswith("ing") and _has_vowel(b, len(b) - 4):
            stripped = b[:-3]
        if stripped is not None:
            b = stripped
            if b.endswith(("at", "bl", "iz")):
                b += "e"
            elif _doublec(b, len(b) - 1):
                if b[-1] not in "lsz":
                    b = b[:-1]
            elif _measure(b, len(b) - 1) == 1 and _cvc(b, len(b) - 1):
                b += "e"

    # step 1c: y -> i when the stem has a vowel
    if b.endswith("y") and _has_vowel(b, len(b) - 2):
        b = b[:-1] + "i"

    # steps 2 and 3: double suffix -> single (condition m(stem) > 0);
    # first matching suffix wins and ENDS the step, matched or not applied
    for table in (_STEP2, _STEP3):
        for suf, rep in table:
            if b.endswith(suf):
                j = len(b) - len(suf) - 1
                if _measure(b, j) > 0:
                    b = b[: j + 1] + rep
                break

    # step 4: strip residual suffix in <c>vcvc<v> context (m(stem) > 1);
    # -ion only after s/t
    for suf in _STEP4:
        if b.endswith(suf):
            j = len(b) - len(suf) - 1
            if suf == "ion" and (j < 0 or b[j] not in "st"):
                continue
            if _measure(b, j) > 1:
                b = b[: j + 1]
            break

    # step 5: final -e (m>1, or m==1 and not *o), then -ll -> -l (m>1).
    # Both m() measurements run over the buffer BEFORE the e-strip.
    j5 = len(b) - 1
    if b.endswith("e"):
        a = _measure(b, j5)
        if a > 1 or (a == 1 and not _cvc(b, len(b) - 2)):
            b = b[:-1]
    if b.endswith("l") and _doublec(b, len(b) - 1) and _measure(b, j5) > 1:
        b = b[:-1]
    return b


def strip_possessive(w: str) -> str:
    """EnglishPossessiveFilter.java: drop a trailing ``'s`` (ASCII, right
    single quote, or fullwidth apostrophe; s case-insensitive)."""
    if len(w) >= 2 and w[-1] in "sS" and w[-2] in ("'", "’", "＇"):
        return w[:-2]
    return w


@lru_cache(maxsize=1 << 16)
def english_filter(w: str) -> str:
    """Post-tokenizer English chain (EnglishAnalyzer.createComponents
    order: possessive -> [lowercase + stop, applied by the tokenizer
    chain] -> Porter stem)."""
    return porter_stem(strip_possessive(w))


# non-decomposable mappings ASCIIFoldingFilter applies beyond NFKD
_FOLD_SPECIAL = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "ß": "ss", "đ": "d",
    "Đ": "D", "þ": "th", "Þ": "TH", "ı": "i",
    "ł": "l", "Ł": "L",
}


@lru_cache(maxsize=1 << 16)
def ascii_fold(s: str) -> str:
    """ASCIIFoldingFilter analog: accented Latin -> ASCII. Decomposable
    accents fold via NFKD + combining-mark drop; ligatures and other
    non-decomposable letters via the explicit table; anything still
    non-ASCII passes through unchanged (foldToASCII's default branch)."""
    if s.isascii():
        return s
    out = []
    for ch in s:
        if ch.isascii():
            out.append(ch)
            continue
        sp = _FOLD_SPECIAL.get(ch)
        if sp is not None:
            out.append(sp)
            continue
        dec = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in dec if not unicodedata.combining(c))
        out.append(kept if kept.isascii() and kept else ch)
    return "".join(out)
