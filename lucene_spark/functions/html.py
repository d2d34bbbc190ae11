"""HTMLStripCharFilter: strip HTML constructs from web-page text.

Re-expresses the reference's ``HTMLStripCharFilter``
(``analysis/common/src/java/org/apache/lucene/analysis/charfilter/
HTMLStripCharFilter.jflex`` — the generated scanner is
``HTMLStripCharFilter.java``) as a Python scanner plus an Arrow-vectorized
fast path.  Semantics implemented (all from the jflex spec):

  - Start tags: inline elements (``InlineElment``, jflex:116-142) are
    removed; every other recognized element substitutes a single ``\\n``
    (``BLOCK_LEVEL_START_TAG_REPLACEMENT``); ``<br>`` in any spelling
    becomes ``\\n``.  Attribute content stops at the first ``>`` EXCEPT
    inside quoted values of the 20 ``on<event>`` attributes or inside
    server-side includes (``OpenTagContent``, jflex:107-114) — a quirk the
    reference's TestHTMLStripCharFilter pins extensively and we preserve.
  - End tags: ``\\s*>`` tails only; inline removed, others ``\\n``.
  - ``<script>``/``<style>``: content dropped (SGML-comment- and
    quote-aware), the whole element substitutes one ``\\n``.
  - Comments ``<!-- -->`` (with nested SSI), ``<!...>`` angle-bang
    declarations, ``<? ... ?>``/``<? ... />`` processing instructions and
    server-side includes are removed; ``<![CDATA[ ... ]]>`` content is
    passed through verbatim.
  - Character references: the 253-name HTML 4 entity table (+ the six
    accepted upper-case variants, ``HTMLCharacterEntities.jflex``),
    decimal/hex numeric refs (code point <= 0x10FFFF; surrogate code
    points become U+FFFD), and paired-surrogate references in all four
    dec/hex combinations.  A named/numeric ref must be followed by ``;``
    except at end of input.
  - Unmatched constructs fall back to verbatim output with a rescan after
    the consumed prefix (the shared ``[^]`` fallback rule, jflex:913-921),
    and end-of-input inside a state follows the jflex ``%eof`` groups
    (Include states emit the pending input, Exclude states drop it).
  - ``escaped_tags`` mirrors the constructor set: listed tags (and the
    special-cased BR/SCRIPT/STYLE) pass through verbatim.

Offset correction follows BaseCharFilter's (position, cumulative-diff)
map, with one deliberate deviation: positions/diffs are in Python str
code-point space, not UTF-16 units — consistent with every other offset
in this engine (the analyzer's OffsetAttribute path).

Scale shape: the batch entry point routes per document.  Docs with no
``&``/``<`` pass through untouched (one Arrow probe); docs whose markup
fits a conservative "plain tags only" profile are rewritten with three
RE2 ``replace_substring_regex`` passes (C kernels, zero Python per doc);
only documents with entities, comments, script/style, event attributes or
malformed markup take the per-doc Python scanner — the same
fast/edge-path split as ``analysis.analyze_batch``'s CJK routing.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "html_strip",
    "html_strip_offsets",
    "correct_offset",
    "html_strip_batch",
    "HTML_ENTITIES",
]

# ---------------------------------------------------------------------------
# Entity table: HTMLCharacterEntities.jflex (253 names + 6 upper variants).
# ---------------------------------------------------------------------------

_ENTITY_PAIRS = [
    ("AElig", "Æ"), ("Aacute", "Á"), ("Acirc", "Â"),
    ("Agrave", "À"), ("Alpha", "Α"), ("Aring", "Å"),
    ("Atilde", "Ã"), ("Auml", "Ä"), ("Beta", "Β"),
    ("Ccedil", "Ç"), ("Chi", "Χ"), ("Dagger", "‡"),
    ("Delta", "Δ"), ("ETH", "Ð"), ("Eacute", "É"),
    ("Ecirc", "Ê"), ("Egrave", "È"), ("Epsilon", "Ε"),
    ("Eta", "Η"), ("Euml", "Ë"), ("Gamma", "Γ"),
    ("Iacute", "Í"), ("Icirc", "Î"), ("Igrave", "Ì"),
    ("Iota", "Ι"), ("Iuml", "Ï"), ("Kappa", "Κ"),
    ("Lambda", "Λ"), ("Mu", "Μ"), ("Ntilde", "Ñ"),
    ("Nu", "Ν"), ("OElig", "Œ"), ("Oacute", "Ó"),
    ("Ocirc", "Ô"), ("Ograve", "Ò"), ("Omega", "Ω"),
    ("Omicron", "Ο"), ("Oslash", "Ø"), ("Otilde", "Õ"),
    ("Ouml", "Ö"), ("Phi", "Φ"), ("Pi", "Π"),
    ("Prime", "″"), ("Psi", "Ψ"), ("Rho", "Ρ"),
    ("Scaron", "Š"), ("Sigma", "Σ"), ("THORN", "Þ"),
    ("Tau", "Τ"), ("Theta", "Θ"), ("Uacute", "Ú"),
    ("Ucirc", "Û"), ("Ugrave", "Ù"), ("Upsilon", "Υ"),
    ("Uuml", "Ü"), ("Xi", "Ξ"), ("Yacute", "Ý"),
    ("Yuml", "Ÿ"), ("Zeta", "Ζ"), ("aacute", "á"),
    ("acirc", "â"), ("acute", "´"), ("aelig", "æ"),
    ("agrave", "à"), ("alefsym", "ℵ"), ("alpha", "α"),
    ("amp", "&"), ("and", "∧"), ("ang", "∠"),
    ("apos", "'"), ("aring", "å"), ("asymp", "≈"),
    ("atilde", "ã"), ("auml", "ä"), ("bdquo", "„"),
    ("beta", "β"), ("brvbar", "¦"), ("bull", "•"),
    ("cap", "∩"), ("ccedil", "ç"), ("cedil", "¸"),
    ("cent", "¢"), ("chi", "χ"), ("circ", "ˆ"),
    ("clubs", "♣"), ("cong", "≅"), ("copy", "©"),
    ("crarr", "↵"), ("cup", "∪"), ("curren", "¤"),
    ("dArr", "⇓"), ("dagger", "†"), ("darr", "↓"),
    ("deg", "°"), ("delta", "δ"), ("diams", "♦"),
    ("divide", "÷"), ("eacute", "é"), ("ecirc", "ê"),
    ("egrave", "è"), ("empty", "∅"), ("emsp", " "),
    ("ensp", " "), ("epsilon", "ε"), ("equiv", "≡"),
    ("eta", "η"), ("eth", "ð"), ("euml", "ë"),
    ("euro", "€"), ("exist", "∃"), ("fnof", "ƒ"),
    ("forall", "∀"), ("frac12", "½"), ("frac14", "¼"),
    ("frac34", "¾"), ("frasl", "⁄"), ("gamma", "γ"),
    ("ge", "≥"), ("gt", ">"), ("hArr", "⇔"),
    ("harr", "↔"), ("hearts", "♥"), ("hellip", "…"),
    ("iacute", "í"), ("icirc", "î"), ("iexcl", "¡"),
    ("igrave", "ì"), ("image", "ℑ"), ("infin", "∞"),
    ("int", "∫"), ("iota", "ι"), ("iquest", "¿"),
    ("isin", "∈"), ("iuml", "ï"), ("kappa", "κ"),
    ("lArr", "⇐"), ("lambda", "λ"), ("lang", "〈"),
    ("laquo", "«"), ("larr", "←"), ("lceil", "⌈"),
    ("ldquo", "“"), ("le", "≤"), ("lfloor", "⌊"),
    ("lowast", "∗"), ("loz", "◊"), ("lrm", "‎"),
    ("lsaquo", "‹"), ("lsquo", "‘"), ("lt", "<"),
    ("macr", "¯"), ("mdash", "—"), ("micro", "µ"),
    ("middot", "·"), ("minus", "−"), ("mu", "μ"),
    ("nabla", "∇"), ("nbsp", " "), ("ndash", "–"),
    ("ne", "≠"), ("ni", "∋"), ("not", "¬"),
    ("notin", "∉"), ("nsub", "⊄"), ("ntilde", "ñ"),
    ("nu", "ν"), ("oacute", "ó"), ("ocirc", "ô"),
    ("oelig", "œ"), ("ograve", "ò"), ("oline", "‾"),
    ("omega", "ω"), ("omicron", "ο"), ("oplus", "⊕"),
    ("or", "∨"), ("ordf", "ª"), ("ordm", "º"),
    ("oslash", "ø"), ("otilde", "õ"), ("otimes", "⊗"),
    ("ouml", "ö"), ("para", "¶"), ("part", "∂"),
    ("permil", "‰"), ("perp", "⊥"), ("phi", "φ"),
    ("pi", "π"), ("piv", "ϖ"), ("plusmn", "±"),
    ("pound", "£"), ("prime", "′"), ("prod", "∏"),
    ("prop", "∝"), ("psi", "ψ"), ("quot", "\""),
    ("rArr", "⇒"), ("radic", "√"), ("rang", "〉"),
    ("raquo", "»"), ("rarr", "→"), ("rceil", "⌉"),
    ("rdquo", "”"), ("real", "ℜ"), ("reg", "®"),
    ("rfloor", "⌋"), ("rho", "ρ"), ("rlm", "‏"),
    ("rsaquo", "›"), ("rsquo", "’"), ("sbquo", "‚"),
    ("scaron", "š"), ("sdot", "⋅"), ("sect", "§"),
    ("shy", "­"), ("sigma", "σ"), ("sigmaf", "ς"),
    ("sim", "∼"), ("spades", "♠"), ("sub", "⊂"),
    ("sube", "⊆"), ("sum", "∑"), ("sup", "⊃"),
    ("sup1", "¹"), ("sup2", "²"), ("sup3", "³"),
    ("supe", "⊇"), ("szlig", "ß"), ("tau", "τ"),
    ("there4", "∴"), ("theta", "θ"), ("thetasym", "ϑ"),
    ("thinsp", " "), ("thorn", "þ"), ("tilde", "˜"),
    ("times", "×"), ("trade", "™"), ("uArr", "⇑"),
    ("uacute", "ú"), ("uarr", "↑"), ("ucirc", "û"),
    ("ugrave", "ù"), ("uml", "¨"), ("upsih", "ϒ"),
    ("upsilon", "υ"), ("uuml", "ü"), ("weierp", "℘"),
    ("xi", "ξ"), ("yacute", "ý"), ("yen", "¥"),
    ("yuml", "ÿ"), ("zeta", "ζ"), ("zwj", "‍"),
    ("zwnj", "‌"),
]
_UPPER_VARIANTS = {"quot": "QUOT", "copy": "COPY", "gt": "GT",
                   "lt": "LT", "reg": "REG", "amp": "AMP"}

HTML_ENTITIES: dict[str, str] = {}
for _n, _v in _ENTITY_PAIRS:
    HTML_ENTITIES[_n] = _v
    _u = _UPPER_VARIANTS.get(_n)
    if _u:
        HTML_ENTITIES[_u] = _v

# Entity-name matcher: longest name first (jflex maximal munch).
_ENTITY_RE = re.compile(
    "|".join(sorted((re.escape(k) for k in HTML_ENTITIES), key=len, reverse=True))
)

# InlineElment, jflex:116-142.
INLINE_ELEMENTS = frozenset(
    """a abbr acronym b basefont bdo big cite code dfn em font i img input
    kbd label q s samp select small span strike strong sub sup textarea tt
    u var""".split()
)

_WS = " \t\n\x0b\f\r"          # Java regex \s
_WSC = r"[ \t\n\x0b\f\r]"

# Quoted strings inside event attributes / SSIs (SingleQuoted/DoubleQuoted).
# The language of ( "\\'" | [^']* )* is "every ' is escaped"; the possessive
# form below is the deterministic linear-time equivalent.
_SQ = r"'(?:\\'|[^'])*+'"
_DQ = r'"(?:\\"|[^"])*+"'
# outer star must backtrack so the SSI ends at the LAST '-->' reachable
# (jflex maximal munch); the alternation itself is first-char deterministic.
_SSI = r"<!--#(?:[^'\"]|" + _SQ + "|" + _DQ + r")*-->"
_SSI_RE = re.compile(_SSI)

_EVENT_SUFFIXES = (
    "abort|blur|change|click|dblclick|error|focus|keydown|keypress|keyup|"
    "load|mousedown|mousemove|mouseout|mouseover|mouseup|reset|select|"
    "submit|unload"
)
_EVENT_ATTR_RE = re.compile(
    r"(?i:on(?:" + _EVENT_SUFFIXES + r"))" + _WSC + r"*=" + _WSC + r"*"
    r"(?:" + _SQ + "|" + _DQ + ")"
)

_PI_RE = re.compile(r"\?[^>]*[/?]>")  # greedy, must yield the final [/?]
_BR_OPEN_RE = re.compile(
    _WSC + r"*(?i:br)(?=[ \t\n\x0b\f\r=/>])"
)  # name part; tail matched with the shared tag-content scanner
_BR_CLOSE_RE = re.compile(_WSC + r"*(?i:br)" + _WSC + r"*>")
_SCRIPT_OPEN_NAME_RE = re.compile(_WSC + r"*(?i:script)")
_STYLE_OPEN_NAME_RE = re.compile(_WSC + r"*(?i:style)")
_SCRIPT_CLOSE_RE = re.compile(r"</" + _WSC + r"*(?i:script)" + _WSC + r"*>")
_STYLE_CLOSE_RE = re.compile(r"</" + _WSC + r"*(?i:style)" + _WSC + r"*>")
_ENDTAIL_RE = re.compile(_WSC + r"*>")
_WSRUN_RE = re.compile(_WSC + r"+")

_HEXNUM_RE = re.compile(r"[xX][0-9A-Fa-f]+")
_DECNUM_RE = re.compile(r"[0-9]+")

# Paired-surrogate character references (AMPERSAND rules, jflex:354-470),
# matched after the '&'.  (pattern, high_is_hex, low_is_hex)
_SURROGATE_RULES = [
    (re.compile(r"#[xX][dD][89aAbB][0-9a-fA-F]{2};&#[xX][dD][c-fC-F][0-9a-fA-F]{2};"), True, True),
    (re.compile(r"#5[56][0-9]{3};&#[xX][dD][c-fC-F][0-9a-fA-F]{2};"), False, True),
    (re.compile(r"#[xX][dD][89aAbB][0-9a-fA-F]{2};&#5[67][0-9]{3};"), True, False),
    (re.compile(r"#5[56][0-9]{3};&#5[67][0-9]{3};"), False, False),
]

_REPLACEMENT = "�"

_EXCLUDE, _SUBSTITUTE, _INCLUDE = 0, 1, 2


def _is_name_start(ch: str) -> bool:
    # Name = [:_\p{ID_Start}] ...  (jflex:70)
    return ch in ":_" or ch.isidentifier()


def _is_name_cont(ch: str) -> bool:
    return ch in "-.:_" or ("a" + ch).isidentifier()


def _name_end(s: str, i: int) -> int:
    n = len(s)
    if i >= n or not _is_name_start(s[i]):
        return i
    j = i + 1
    while j < n and _is_name_cont(s[j]):
        j += 1
    return j


class _Scanner:
    """One document.  Mirrors the jflex states; see module docstring."""

    __slots__ = ("s", "n", "out", "out_len", "cum", "corr_pos", "corr_diff",
                 "esc_br", "esc_script", "esc_style", "esc_tags", "track")

    def __init__(self, s: str, escaped_tags=None, track_offsets: bool = False):
        self.s = s
        self.n = len(s)
        self.out: list[str] = []
        self.out_len = 0
        self.cum = 0
        self.corr_pos: list[int] = []
        self.corr_diff: list[int] = []
        self.track = track_offsets
        self.esc_br = self.esc_script = self.esc_style = False
        tags = set()
        for t in escaped_tags or ():
            tl = t.lower()
            if tl == "br":
                self.esc_br = True
            elif tl == "script":
                self.esc_script = True
            elif tl == "style":
                self.esc_style = True
            else:
                tags.add(tl)
        self.esc_tags = tags

    # -- output / offset bookkeeping ------------------------------------
    def _emit(self, txt: str) -> None:
        if txt:
            self.out.append(txt)
            self.out_len += len(txt)

    def _corr(self, pos: int) -> None:
        # BaseCharFilter.addOffCorrectMap: non-decreasing positions, a
        # repeated position overwrites the previous diff.
        if not self.track:
            return
        if self.corr_pos and self.corr_pos[-1] == pos:
            self.corr_diff[-1] = self.cum
        else:
            self.corr_pos.append(pos)
            self.corr_diff.append(self.cum)

    # -- driver ----------------------------------------------------------
    def run(self) -> str:
        s, n = self.s, self.n
        i = 0
        while i < n:
            c = s[i]
            if c == "&":
                i = self._amp(i)
            elif c == "<":
                i = self._lt(i)
            else:
                na = s.find("&", i)
                nl = s.find("<", i)
                j = n
                if na != -1:
                    j = na
                if nl != -1 and nl < j:
                    j = nl
                self._emit(s[i:j])
                i = j
        return "".join(self.out)

    # -- character references --------------------------------------------
    def _amp(self, start: int) -> int:
        s, n = self.s, self.n
        j = start + 1
        for pat, hi_hex, lo_hex in _SURROGATE_RULES:
            m = pat.match(s, j)
            if not m:
                continue
            txt = m.group()
            semi = txt.index(";")
            hi_s = txt[2:semi] if hi_hex else txt[1:semi]
            hi = int(hi_s, 16) if hi_hex else int(hi_s)
            lo_part = txt[semi + 3:-1]
            lo_s = lo_part[1:] if lo_hex else lo_part
            lo = int(lo_s, 16) if lo_hex else int(lo_s)
            if 0xD800 <= hi <= 0xDBFF and 0xDC00 <= lo <= 0xDFFF:
                ch = chr(((hi - 0xD800) << 10) + (lo - 0xDC00) + 0x10000)
                # 1 ('&') + match length consumed, 1 code point out
                self.cum += 1 + len(txt) - 1
                self._corr(self.out_len + 1)
                self._emit(ch)
                return m.end()
            # runtime surrogate check failed: consume only '#', rescan rest
            return self._numeric(start, j + 1)
        m = _ENTITY_RE.match(s, j)
        if m:
            return self._ref_tail(start, "&" + m.group(),
                                  HTML_ENTITIES[m.group()], m.end())
        if j < n and s[j] == "#":
            return self._numeric(start, j + 1)
        # fallback [^]: '&' verbatim, rescan
        self._emit("&")
        return j

    def _numeric(self, start: int, j: int) -> int:
        s, n = self.s, self.n
        m = _HEXNUM_RE.match(s, j)
        if m:
            if (m.end() - j) <= 6:
                cp = int(s[j + 1:m.end()], 16)
                if cp <= 0x10FFFF:
                    pend = _REPLACEMENT if 0xD800 <= cp <= 0xDFFF else chr(cp)
                    return self._ref_tail(start, s[start:m.end()], pend, m.end())
            self._emit(s[start:m.end()])   # too long / beyond max: verbatim
            return m.end()
        m = _DECNUM_RE.match(s, j)
        if m:
            if (m.end() - j) <= 7:
                cp = int(m.group())
                if cp <= 0x10FFFF:
                    pend = _REPLACEMENT if 0xD800 <= cp <= 0xDFFF else chr(cp)
                    return self._ref_tail(start, s[start:m.end()], pend, m.end())
            self._emit(s[start:m.end()])
            return m.end()
        # NUMERIC_CHARACTER fallback / EOF: '&#' verbatim
        self._emit(s[start:j])
        return j

    def _ref_tail(self, start: int, raw: str, pend: str, k: int) -> int:
        # CHARACTER_REFERENCE_TAIL: ';' required except at end of input.
        s, n = self.s, self.n
        if k < n and s[k] == ";":
            self.cum += (k + 1 - start) - len(pend)
            self._corr(self.out_len + len(pend))
            self._emit(pend)
            return k + 1
        if k >= n:
            self.cum += (k - start) - len(pend)
            self._corr(self.out_len + len(pend))
            self._emit(pend)
            return k
        self._emit(raw)
        return k

    # -- tags -------------------------------------------------------------
    def _lt(self, start: int) -> int:
        s, n = self.s, self.n
        j = start + 1
        if j >= n:                       # EOF in LEFT_ANGLE_BRACKET: Include
            self._emit("<")
            return j
        c = s[j]
        if c == "!":
            return self._bang(start, j + 1)
        if c == "/":
            return self._close(start, j + 1)
        if c == "?":
            m = _PI_RE.match(s, j)
            if m:
                self.cum += m.end() - start
                self._corr(self.out_len)
                return m.end()
            self._emit("<")
            return j
        # maximal munch among \s+ / br / script / style / Inline / Name
        cands = []          # (length, priority, kind, payload)
        m = _BR_OPEN_RE.match(s, j)
        if m:
            end = self._match_start_tail(m.end())
            if end >= 0:
                cands.append((end - j, 0, "br", end))
        m = _SCRIPT_OPEN_NAME_RE.match(s, j)
        if m:
            end = self._match_script_style_tail(m.end())
            if end >= 0:
                cands.append((end - j, 1, "script", end))
        m = _STYLE_OPEN_NAME_RE.match(s, j)
        if m:
            end = self._match_script_style_tail(m.end())
            if end >= 0:
                cands.append((end - j, 2, "style", end))
        wm = _WSRUN_RE.match(s, j)
        if wm:
            cands.append((wm.end() - j, 3, "space", wm.end()))
        k = _name_end(s, j)
        if k > j:
            low = s[j:k].lower()
            if low in INLINE_ELEMENTS:
                cands.append((k - j, 4, "inline", k))
            cands.append((k - j, 5, "name", k))
        if not cands:
            self._emit("<")              # fallback: '<' verbatim, rescan
            return j
        cands.sort(key=lambda t: (-t[0], t[1]))
        _, _, kind, pos = cands[0]
        if kind == "br":
            if self.esc_br:
                self._emit(s[start:pos])
            else:
                self.cum += (pos - start) - 1
                self._corr(self.out_len + 1)
                self._emit("\n")
            return pos
        if kind == "script":
            return self._script_style(start, pos, _SCRIPT_CLOSE_RE,
                                      self.esc_script)
        if kind == "style":
            return self._script_style(start, pos, _STYLE_CLOSE_RE,
                                      self.esc_style)
        if kind == "space":
            return self._angle_space(start, pos)
        low = s[j:k].lower()
        if low in self.esc_tags:
            mode = _INCLUDE
        elif kind == "inline":
            mode = _EXCLUDE
        else:
            mode = _SUBSTITUTE
        return self._start_tag_tail(start, k, mode)

    def _angle_space(self, start: int, j: int) -> int:
        # LEFT_ANGLE_BRACKET_SPACE: only Inline/Name (+ fallback / EOF).
        s, n = self.s, self.n
        if j >= n:                       # EOF: Include
            self._emit(s[start:j])
            return j
        k = _name_end(s, j)
        if k > j:
            low = s[j:k].lower()
            if low in self.esc_tags:
                mode = _INCLUDE
            elif low in INLINE_ELEMENTS:
                mode = _EXCLUDE
            else:
                mode = _SUBSTITUTE
            return self._start_tag_tail(start, k, mode)
        self._emit(s[start:j])           # fallback
        return j

    # START_TAG_TAIL pattern: ( ( '='\s* | \s+ ) OpenTagContent )? \s* '/'? '>'
    def _match_start_tail(self, j: int) -> int:
        s, n = self.s, self.n
        if j < n and (s[j] == "=" or s[j] in _WS):
            j += 1
            while j < n and s[j] in _WS:
                j += 1
            j = self._consume_tag_content(j)
            if j < n and s[j] == ">":
                return j + 1
            return -1
        # no prefix: \s* '/'? '>' with no leading ws possible here
        if j < n and s[j] == "/":
            return j + 2 if (j + 1 < n and s[j + 1] == ">") else -1
        if j < n and s[j] == ">":
            return j + 1
        return -1

    # script/style open tail: ( \s+ OpenTagContent )? \s* '>'  (no '=' or '/')
    def _match_script_style_tail(self, j: int) -> int:
        s, n = self.s, self.n
        if j < n and s[j] in _WS:
            j += 1
            while j < n and s[j] in _WS:
                j += 1
            j = self._consume_tag_content(j)
            # OpenTagContent absorbed any trailing ws; '/' would be content
            # too, but the rule has no '/?' — a '/' right before '>' is
            # consumed by OpenTagContent's [^<>], so '>' is all we need.
            if j < n and s[j] == ">":
                return j + 1
            return -1
        if j < n and s[j] == ">":
            return j + 1
        return -1

    def _consume_tag_content(self, j: int) -> int:
        # OpenTagContent = ( EventAttribute | [^<>] | ServerSideInclude )*
        # Greedy scan, EventAttribute preferred at 'o' (alternation order).
        s, n = self.s, self.n
        while j < n:
            ch = s[j]
            if ch == ">":
                break
            if ch == "<":
                m = _SSI_RE.match(s, j)
                if m:
                    j = m.end()
                    continue
                break
            if ch in "oO":
                m = _EVENT_ATTR_RE.match(s, j)
                if m:
                    j = m.end()
                    continue
            j += 1
        return j

    def _start_tag_tail(self, start: int, k: int, mode: int) -> int:
        s, n = self.s, self.n
        end = self._match_start_tail(k)
        if end >= 0:
            if mode == _INCLUDE:
                self._emit(s[start:end])
            elif mode == _EXCLUDE:
                self.cum += end - start
                self._corr(self.out_len)
            else:
                self.cum += (end - start) - 1
                self._corr(self.out_len + 1)
                self._emit("\n")
            return end
        if k >= n:                       # EOF inside the tail state
            if mode == _INCLUDE:
                self._emit(s[start:k])
            else:
                self.cum += k - start
                self._corr(self.out_len)
            return k
        self._emit(s[start:k])           # fallback: accumulated input verbatim
        return k

    def _close(self, start: int, j: int) -> int:
        # LEFT_ANGLE_BRACKET_SLASH: \s+ | br-close | Inline | Name
        s, n = self.s, self.n
        while True:
            if j >= n:                   # EOF: Include
                self._emit(s[start:j])
                return j
            bm = _BR_CLOSE_RE.match(s, j)
            k = _name_end(s, j)
            wm = _WSRUN_RE.match(s, j)
            # maximal munch: br-close beats Name ('br') by length
            if bm and (bm.end() - j) >= (k - j):
                if self.esc_br:
                    self._emit(s[start:bm.end()])
                else:
                    self.cum += (bm.end() - start) - 1
                    self._corr(self.out_len + 1)
                    self._emit("\n")
                return bm.end()
            if k > j:
                low = s[j:k].lower()
                if low in self.esc_tags:
                    mode = _INCLUDE
                elif low in INLINE_ELEMENTS:
                    mode = _EXCLUDE
                else:
                    mode = _SUBSTITUTE
                return self._end_tag_tail(start, k, mode)
            if wm:
                j = wm.end()
                continue
            self._emit(s[start:j])       # fallback
            return j

    def _end_tag_tail(self, start: int, k: int, mode: int) -> int:
        s, n = self.s, self.n
        m = _ENDTAIL_RE.match(s, k)
        if m:
            end = m.end()
            if mode == _INCLUDE:
                self._emit(s[start:end])
            elif mode == _EXCLUDE:
                self.cum += end - start
                self._corr(self.out_len)
            else:
                self.cum += (end - start) - 1
                self._corr(self.out_len + 1)
                self._emit("\n")
            return end
        if k >= n:
            if mode == _INCLUDE:
                self._emit(s[start:k])
            else:
                self.cum += k - start
                self._corr(self.out_len)
            return k
        self._emit(s[start:k])
        return k

    # -- <!...> family -----------------------------------------------------
    def _bang(self, start: int, j: int) -> int:
        s, n = self.s, self.n
        acclen = 2                        # '<!'
        while j < n:
            if acclen == 2 and s.startswith("--", j):
                return self._comment(start, j + 2)
            if acclen == 2 and s.startswith("[CDATA[", j):
                self.cum += (j + 7) - start
                self._corr(self.out_len)
                return self._cdata(j + 7)
            if s[j] == ">":
                self.cum += (j + 1) - start
                self._corr(self.out_len)
                return j + 1
            j += 1
            acclen += 1
        self._emit(s[start:n])            # EOF: Include
        return n

    def _comment(self, start: int, j: int) -> int:
        s, n = self.s, self.n
        while j < n:
            if s.startswith("<!--#", j):
                j = self._ssi(j + 5)
                continue
            if s.startswith("-->", j):
                self.cum += (j + 3) - start
                self._corr(self.out_len)
                return j + 3
            j += 1
        self.cum += n - start             # EOF: Exclude
        self._corr(self.out_len)
        return n

    def _ssi(self, j: int) -> int:
        s, n = self.s, self.n
        while j < n:
            if s.startswith("-->", j):
                return j + 3
            c = s[j]
            if c == "'":
                j = self._quoted(j + 1, "'")
                continue
            if c == '"':
                j = self._quoted(j + 1, '"')
                continue
            j += 1
        return n

    def _quoted(self, j: int, q: str) -> int:
        s, n = self.s, self.n
        while j < n:
            c = s[j]
            if c == "\\" and j + 1 < n:
                j += 2
                continue
            if c == q:
                return j + 1
            j += 1
        return n

    def _cdata(self, j: int) -> int:
        s, n = self.s, self.n
        k = s.find("]]>", j)
        if k == -1:
            self._emit(s[j:])
            return n
        self._emit(s[j:k])
        self.cum += 3
        self._corr(self.out_len)
        return k + 3

    def _script_style(self, start: int, content_start: int, close_re,
                      escaped: bool) -> int:
        s, n = self.s, self.n
        if escaped:
            self._emit(s[start:content_start])   # open tag verbatim
        j = content_start
        while j < n:
            if s.startswith("<!--", j):
                j = self._sgml_comment(j + 4)
                continue
            m = close_re.match(s, j)
            if m:
                if escaped:
                    self.cum += j - content_start     # dropped content
                    self._corr(self.out_len)
                    self._emit(m.group())             # close tag verbatim
                else:
                    self.cum += (m.end() - start) - 1
                    self._corr(self.out_len + 1)
                    self._emit("\n")
                return m.end()
            j += 1
        # EOF: Exclude — pending input dropped
        self.cum += n - (content_start if escaped else start)
        self._corr(self.out_len)
        return n

    def _sgml_comment(self, j: int) -> int:
        # SCRIPT_COMMENT / STYLE_COMMENT: quote- and SSI-aware, ends at -->
        s, n = self.s, self.n
        while j < n:
            if s.startswith("<!--#", j):
                j = self._ssi(j + 5)
                continue
            if s.startswith("-->", j):
                return j + 3
            c = s[j]
            if c == "'":
                j = self._quoted(j + 1, "'")
                continue
            if c == '"':
                j = self._quoted(j + 1, '"')
                continue
            j += 1
        return n


def html_strip(text: str, escaped_tags=None) -> str:
    """Strip HTML constructs from ``text`` (HTMLStripCharFilter semantics)."""
    if "&" not in text and "<" not in text:
        return text
    return _Scanner(text, escaped_tags).run()


def html_strip_offsets(text: str, escaped_tags=None):
    """Strip + BaseCharFilter offset-correction map.

    Returns ``(stripped, positions, diffs)``; ``correct_offset`` maps an
    offset in the stripped text back into the original (code-point space).
    """
    sc = _Scanner(text, escaped_tags, track_offsets=True)
    out = sc.run()
    return out, np.asarray(sc.corr_pos, dtype=np.int64), \
        np.asarray(sc.corr_diff, dtype=np.int64)


def correct_offset(off: int, positions: np.ndarray, diffs: np.ndarray) -> int:
    """BaseCharFilter.correctOffset: off + diff of last entry at pos <= off."""
    idx = int(np.searchsorted(positions, off, side="right")) - 1
    return off + (int(diffs[idx]) if idx >= 0 else 0)


# ---------------------------------------------------------------------------
# Vectorized batch path
# ---------------------------------------------------------------------------

# A document is "plain-tag safe" when every '<' starts a tag of the simple
# profile below (ASCII name; attributes free of quotes, '&', '<', '>'; end
# tags attribute-free) and the doc has no '&', no '<!'/'<?', and no
# script/style element.  For such docs the scanner's behavior reduces to
# three context-free rewrites, run as RE2 kernels.
_NAME_ASCII = r"[A-Za-z][-.:_A-Za-z0-9]*"
_SAFE_ATTRS = r"(?:[\s=][^<>'\"&]*)?"
_SAFE_TAG_RE2 = (
    r"<(?:/\s*" + _NAME_ASCII + r"\s*|" + _NAME_ASCII + _SAFE_ATTRS + r"/?)>"
)
_UNSAFE_PROBE_RE2 = r"&|<[!?]|(?i)<\s*(?:script|style)[\s>]"

_INLINE_ALT = "|".join(sorted(INLINE_ELEMENTS, key=len, reverse=True))
_RE2_BR = r"(?i)</?\s*br(?:[\s=][^<>'\"&]*)?/?>"
_RE2_INLINE_OPEN = r"(?i)<(?:" + _INLINE_ALT + r")(?:[\s=][^<>'\"&]*)?/?>"
_RE2_INLINE_CLOSE = r"(?i)</\s*(?:" + _INLINE_ALT + r")\s*>"
_RE2_ANY_TAG = r"<[^>]*>"


def html_strip_batch(texts, escaped_tags=None) -> pa.Array:
    """Batch strip with per-document routing (see module docstring).

    ``texts``: pa.Array / pa.ChunkedArray / pd.Series / list of str.
    Returns a pyarrow StringArray aligned with the input.  Null → null.
    """
    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        import pandas as pd

        if isinstance(texts, pd.Series):
            arr = pa.Array.from_pandas(texts.astype("string"))
        else:
            arr = pa.array(list(texts), type=pa.string())
    n = len(arr)
    if n == 0:
        return arr
    if escaped_tags:
        # escaped tags disable the rewrite fast path (INCLUDE semantics)
        vals = arr.to_pylist()
        return pa.array(
            [None if v is None else html_strip(v, escaped_tags) for v in vals],
            type=pa.string(),
        )
    filled = pc.fill_null(arr, "")
    has_markup = pc.or_(
        pc.match_substring(filled, "<"), pc.match_substring(filled, "&")
    ).to_numpy(zero_copy_only=False)
    if not has_markup.any():
        return arr
    # safe iff no unsafe construct and every '<' is a safe-profile tag
    unsafe = pc.match_substring_regex(filled, _UNSAFE_PROBE_RE2)
    lt_count = pc.count_substring(filled, "<")
    tag_count = pc.count_substring_regex(filled, _SAFE_TAG_RE2)
    safe = pc.and_(
        pc.invert(unsafe), pc.equal(lt_count, tag_count)
    ).to_numpy(zero_copy_only=False)
    fast = has_markup & safe
    edge = has_markup & ~safe
    result = np.asarray(arr.to_numpy(zero_copy_only=False), dtype=object).copy()
    if fast.any():
        sub = pc.filter(filled, pa.array(fast))
        sub = pc.replace_substring_regex(sub, _RE2_BR, "\n")
        sub = pc.replace_substring_regex(sub, _RE2_INLINE_OPEN, "")
        sub = pc.replace_substring_regex(sub, _RE2_INLINE_CLOSE, "")
        sub = pc.replace_substring_regex(sub, _RE2_ANY_TAG, "\n")
        result[fast] = np.asarray(sub.to_numpy(zero_copy_only=False),
                                  dtype=object)
    if edge.any():
        for idx in np.nonzero(edge)[0]:
            v = result[idx]
            if v is not None:
                result[int(idx)] = _Scanner(v).run()
    return pa.array(result, type=pa.string())
