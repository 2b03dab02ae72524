"""Format-dialect tokenizer and translators.

The reference accepts two format dialects, selected per format string
(reference: TimestampParser.java:64-81, TimestampFormatter.java:65-84):

* **ruby**  — strptime/strftime directives; selected when the string
  contains ``%``.
* **java**  — Joda-Time ``DateTimeFormat`` patterns, with a grafted nano
  extension ``nnnnnnnnn`` (parse) / ``nnnnnnnnn``/``nnnnnn`` (format).

Both dialects are tokenized here into one intermediate representation
(list of :class:`Tok`), from which the engine derives:

* an anchored regex + field list (vectorized parsing — Catalyst
  ``regexp_extract`` or numpy ``re``),
* a Catalyst formatting plan (``date_format`` chunks + nano/offset
  segments),
* optionally a plain Spark datetime pattern when the format is exactly
  expressible (the analog of the reference's ``auto_java`` dialect
  lowering, TimestampFormatConverter.java:115-134 — our fast path).

The ruby→java translation table below mirrors
TimestampFormatConverter.java:57-97 (public directive semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

# ---------------------------------------------------------------------------
# Token IR
# ---------------------------------------------------------------------------

# Token kinds
LIT = "LIT"  # literal text
Y4 = "Y4"  # 4-digit year (%Y, yyyy)
Y2 = "Y2"  # 2-digit year (%y, yy)
CENTURY = "CENTURY"  # %C, CC
MONTH_NUM = "MONTH_NUM"  # %m, MM
MONTH_ABBR = "MONTH_ABBR"  # %b %h, MMM
MONTH_FULL = "MONTH_FULL"  # %B, MMMM
DAY_NUM = "DAY_NUM"  # %d %e, dd
DOY = "DOY"  # %j, DDD
DAY_ABBR = "DAY_ABBR"  # %a, EEE
DAY_FULL = "DAY_FULL"  # %A, EEEE
H24 = "H24"  # %H %k, HH
H12 = "H12"  # %I %l, hh
H24C = "H24C"  # java k/kk — Joda clockhour-of-day 1..24
H11 = "H11"  # java K/KK — Joda hour-of-halfday 0..11
MINUTE = "MINUTE"  # %M, mm
SECOND = "SECOND"  # %S, ss
FRAC = "FRAC"  # %N %L, S+, n+  (n = digits; variable => 1..9 digits)
AMPM = "AMPM"  # %p %P, a
TZOFF = "TZOFF"  # %z %:z %::z, Z  (style: '', ':', '::')
TZNAME = "TZNAME"  # %Z, z
EPOCH = "EPOCH"  # %s
WEEK = "WEEK"  # %U %V %W, w (parse: used with GYEAR, else match+ignore)
WDAY = "WDAY"  # %u %w, e (parse: used with GYEAR, else match+ignore)
ERA = "ERA"  # G (java only; format 'AD', parse ignore)
GYEAR = "GYEAR"  # %G (%g 2-digit: digits=2) — ISO week-based year

_NUMERIC_KINDS = {
    Y4, Y2, CENTURY, MONTH_NUM, DAY_NUM, DOY, H24, H12, H24C, H11,
    MINUTE, SECOND, WEEK, WDAY, EPOCH, GYEAR,
}


@dataclass(frozen=True)
class Tok:
    kind: str
    text: str = ""  # literal text for LIT
    digits: int = 0  # fraction digit count (FRAC) / field width hint
    variable: bool = False  # FRAC with 1..9 digits (ruby %N bare, java S+)
    style: str = ""  # TZOFF colon style ('', ':', '::')
    pad: str = ""  # '-' no pad, '_' space pad, '0' zero pad (ruby flags)
    upcase: bool = False  # '^' flag


@dataclass(frozen=True)
class ParsedFormat:
    source: str
    dialect: str  # 'ruby' | 'java'
    tokens: tuple[Tok, ...] = field(default_factory=tuple)
    # java parser nano extension: format contained 'nnnnnnnnn'
    # (TimestampParser.java:70-75 — nano re-extracted from raw text)
    java_nano_hack: bool = False
    # java formatter micro extension 'nnnnnn' (TimestampFormatter.java:76-80)
    java_micro_hack: bool = False

    def has(self, *kinds: str) -> bool:
        return any(t.kind in kinds for t in self.tokens)


def detect_dialect(fmt: str) -> str:
    return "ruby" if "%" in fmt else "java"


# ---------------------------------------------------------------------------
# ruby tokenizer
# ---------------------------------------------------------------------------

_RUBY_DIRECTIVE = re.compile(r"%([-_^#0]*)(\d*)(:{0,2})([A-Za-z%])")

# composite directives expand to sub-format strings
_RUBY_COMPOSITE = {
    "D": "%m/%d/%y",
    "F": "%Y-%m-%d",
    "T": "%H:%M:%S",
    "X": "%H:%M:%S",
    "R": "%H:%M",
    "r": "%I:%M:%S %p",
    "v": "%e-%b-%Y",
    "x": "%m/%d/%y",
    "c": "%a %b %e %H:%M:%S %Y",
}

_RUBY_SIMPLE = {
    "Y": Tok(Y4),
    "y": Tok(Y2),
    "C": Tok(CENTURY),
    "m": Tok(MONTH_NUM),
    "b": Tok(MONTH_ABBR),
    "h": Tok(MONTH_ABBR),
    "B": Tok(MONTH_FULL),
    "d": Tok(DAY_NUM),
    "e": Tok(DAY_NUM, pad="_"),
    "j": Tok(DOY),
    "a": Tok(DAY_ABBR),
    "A": Tok(DAY_FULL),
    "H": Tok(H24),
    "k": Tok(H24, pad="_"),
    "I": Tok(H12),
    "l": Tok(H12, pad="_"),
    "M": Tok(MINUTE),
    "S": Tok(SECOND),
    "L": Tok(FRAC, digits=3),
    "p": Tok(AMPM),
    "P": Tok(AMPM, text="lower"),
    "Z": Tok(TZNAME),
    "s": Tok(EPOCH),
    "U": Tok(WEEK),
    "V": Tok(WEEK),
    "W": Tok(WEEK),
    "u": Tok(WDAY),
    "w": Tok(WDAY),
    # ISO week-based year (JRuby strptime accepts these,
    # TimestampParser.java:101-121); combined with %V+%u they define a
    # full ISO week date, alone they approximate the calendar year.
    "G": Tok(GYEAR),
    "g": Tok(GYEAR, digits=2),
}


def tokenize_ruby(fmt: str) -> tuple[Tok, ...]:
    out: list[Tok] = []
    pos = 0
    for m in _RUBY_DIRECTIVE.finditer(fmt):
        if m.start() > pos:
            out.append(Tok(LIT, text=fmt[pos : m.start()]))
        flags, width, colons, ch = m.groups()
        pos = m.end()
        if ch == "%":
            out.append(Tok(LIT, text="%"))
            continue
        if ch in _RUBY_COMPOSITE:
            out.extend(tokenize_ruby(_RUBY_COMPOSITE[ch]))
            continue
        if ch == "N":
            digits = int(width) if width else 9
            out.append(Tok(FRAC, digits=min(digits, 9), variable=not width))
            continue
        if ch == "z":
            out.append(Tok(TZOFF, style=colons))
            continue
        tok = _RUBY_SIMPLE.get(ch)
        if tok is None:
            # unknown directive (%n, %t, %G, ...): treat conservatively
            if ch == "n":
                out.append(Tok(LIT, text="\n"))
            elif ch == "t":
                out.append(Tok(LIT, text="\t"))
            else:
                raise ValueError(f"Unsupported ruby strftime directive %{ch} in {fmt!r}")
            continue
        pad = "-" if "-" in flags else ("_" if "_" in flags else ("0" if "0" in flags else tok.pad))
        out.append(replace(tok, pad=pad, upcase="^" in flags or tok.upcase))
    if pos < len(fmt):
        out.append(Tok(LIT, text=fmt[pos:]))
    return tuple(out)


# ---------------------------------------------------------------------------
# java (Joda) tokenizer
# ---------------------------------------------------------------------------

_JODA_MAP = {
    "y": {1: Tok(Y4), 2: Tok(Y2), 4: Tok(Y4)},
    "Y": {1: Tok(Y4), 2: Tok(Y2), 4: Tok(Y4)},  # year-of-era ~ year for CE
    "x": {1: Tok(Y4), 2: Tok(Y2), 4: Tok(Y4)},  # weekyear; approximated
    "C": {2: Tok(CENTURY)},
    "M": {1: Tok(MONTH_NUM), 2: Tok(MONTH_NUM), 3: Tok(MONTH_ABBR), 4: Tok(MONTH_FULL)},
    "d": {1: Tok(DAY_NUM, pad="-"), 2: Tok(DAY_NUM)},
    "D": {1: Tok(DOY, pad="-"), 3: Tok(DOY)},
    "E": {3: Tok(DAY_ABBR), 4: Tok(DAY_FULL)},
    "e": {1: Tok(WDAY)},
    "H": {1: Tok(H24, pad="-"), 2: Tok(H24)},
    "h": {1: Tok(H12, pad="-"), 2: Tok(H12)},
    # Joda clockhour-of-day (1-24) and hour-of-halfday (0-11) — the
    # reference accepts any Joda letter (TimestampParser.java:76-80)
    "k": {1: Tok(H24C, pad="-"), 2: Tok(H24C)},
    "K": {1: Tok(H11, pad="-"), 2: Tok(H11)},
    "m": {1: Tok(MINUTE, pad="-"), 2: Tok(MINUTE)},
    "s": {1: Tok(SECOND, pad="-"), 2: Tok(SECOND)},
    "a": {1: Tok(AMPM)},
    "z": {1: Tok(TZNAME)},
    "Z": {1: Tok(TZOFF)},
    "w": {1: Tok(WEEK, pad="-"), 2: Tok(WEEK)},
    "G": {1: Tok(ERA)},
}


def tokenize_java(fmt: str) -> tuple[Tok, ...]:
    out: list[Tok] = []
    i = 0
    n = len(fmt)
    while i < n:
        c = fmt[i]
        if c == "'":
            # quoted literal; '' is an escaped quote
            j = i + 1
            buf = []
            while j < n:
                if fmt[j] == "'":
                    if j + 1 < n and fmt[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(fmt[j])
                j += 1
            out.append(Tok(LIT, text="".join(buf) if buf else "'"))
            i = j + 1
            continue
        if c.isalpha():
            j = i
            while j < n and fmt[j] == c:
                j += 1
            run = j - i
            if c == "S":
                out.append(Tok(FRAC, digits=min(run, 9), variable=True))
            elif c == "n":
                # grafted nano extension (TimestampParser.java:70-75)
                out.append(Tok(FRAC, digits=min(run, 9), variable=True))
            else:
                table = _JODA_MAP.get(c)
                if table is None:
                    raise ValueError(f"Unsupported Joda pattern letter {c!r} in {fmt!r}")
                tok = table.get(run) or table.get(max(table))
                out.append(tok)
            i = j
            continue
        # unquoted non-letter chars are literals
        j = i
        while j < n and not fmt[j].isalpha() and fmt[j] != "'":
            j += 1
        out.append(Tok(LIT, text=fmt[i:j]))
        i = j
    return tuple(out)


def parse_format(fmt: str) -> ParsedFormat:
    dialect = detect_dialect(fmt)
    if dialect == "ruby":
        return ParsedFormat(source=fmt, dialect="ruby", tokens=tokenize_ruby(fmt))
    return ParsedFormat(
        source=fmt,
        dialect="java",
        tokens=tokenize_java(fmt),
        java_nano_hack="nnnnnnnnn" in fmt,
        java_micro_hack="nnnnnn" in fmt and "nnnnnnnnn" not in fmt,
    )


# ---------------------------------------------------------------------------
# ruby → java conversion (parity with TimestampFormatConverter.toJavaFormat)
# ---------------------------------------------------------------------------

# mirrors RUBY_TO_JAVA_FORMAT_TABLE (TimestampFormatConverter.java:57-97)
RUBY_TO_JAVA_FORMAT_TABLE = {
    "A": "EEEE", "a": "EEE", "B": "MMMM", "b": "MMM", "C": "CC",
    "c": "EEE MMM dd HH:mm:ss yyyy", "D": "MM/dd/yy", "d": "dd", "e": "dd",
    "F": "yyyy-MM-dd", "H": "HH", "h": "MMM", "I": "hh", "j": "DDD",
    "L": "SSS", "M": "mm", "m": "MM", "N": "nnnnnnnnn", "P": "a", "p": "a",
    "R": "HH:mm", "r": "hh:mm:ss a", "S": "ss", "T": "HH:mm:ss", "U": "w",
    "u": "e", "v": "dd-MMM-yyyy", "V": "w", "W": "w", "w": "e",
    "X": "HH:mm:ss", "x": "MM/dd/yy", "Y": "yyyy", "y": "yy", "Z": "z",
    "z": "Z",
}

_CONVERT_IDENTIFIER = re.compile(
    "%[-_^#0-9:]*([" + "".join(re.escape(k) for k in RUBY_TO_JAVA_FORMAT_TABLE) + "])"
)
_NON_IDENTIFIER = re.compile(r"(^|\s)([^%\s]\S*)")


def ruby_to_java_format(ruby_format: str) -> "str | None":
    """Translate a ruby strptime format to a Joda pattern; ``None`` when any
    ``%`` directive survives (the reference's give-up rule,
    TimestampFormatConverter.java:115-134)."""
    quoted = _NON_IDENTIFIER.sub(lambda m: f"{m.group(1)}'{m.group(2)}'", ruby_format)
    converted = _CONVERT_IDENTIFIER.sub(
        lambda m: RUBY_TO_JAVA_FORMAT_TABLE[m.group(1)], quoted
    )
    if "%" in converted:
        return None
    return converted


# ---------------------------------------------------------------------------
# IR → Spark datetime pattern (fast-path lowering, formatting chunks)
# ---------------------------------------------------------------------------

_SPARK_PATTERN_CHUNK = {
    Y4: "yyyy",
    Y2: "yy",
    MONTH_NUM: "MM",
    MONTH_ABBR: "MMM",
    MONTH_FULL: "MMMM",
    DAY_NUM: "dd",
    DOY: "DDD",
    DAY_ABBR: "EEE",
    DAY_FULL: "EEEE",
    H24: "HH",
    H12: "hh",
    H24C: "kk",
    H11: "KK",
    MINUTE: "mm",
    SECOND: "ss",
    AMPM: "a",
    ERA: "G",
}

# unpadded variants (ruby '-'/'_' flags render without leading zero; the
# space-pad variant is post-processed with lpad in the formatter plan)
_SPARK_PATTERN_CHUNK_NOPAD = {
    MONTH_NUM: "M",
    DAY_NUM: "d",
    DOY: "D",
    H24: "H",
    H12: "h",
    H24C: "k",
    H11: "K",
    MINUTE: "m",
    SECOND: "s",
}


def spark_literal(text: str) -> str:
    """Quote literal text for a Spark datetime pattern."""
    if not text:
        return ""
    if re.search(r"[A-Za-z']", text):
        return "'" + text.replace("'", "''") + "'"
    return text


def to_spark_parse_pattern(pf: ParsedFormat) -> "str | None":
    """Lower a format to a plain Spark `to_timestamp` pattern, or ``None``
    when not exactly expressible (variable fractions, named zones in %z,
    ruby-specific padding, epoch, week fields...).

    This is the analog of the reference's `auto_java` lowering: the
    cheapest engine wins when it is provably equivalent.
    """
    chunks: list[str] = []
    for t in pf.tokens:
        if t.kind == LIT:
            chunks.append(spark_literal(t.text))
        elif t.kind == FRAC:
            if t.variable:
                return None  # variable digit count not expressible
            if t.digits > 6:
                return None  # > µs cannot round-trip through TimestampType
            chunks.append("S" * t.digits)
        elif t.kind == TZOFF:
            # ruby %z also matches named zones ("UTC") — Spark X/Z do not;
            # java dialect Z is offset-only, expressible.
            if pf.dialect == "ruby":
                return None
            chunks.append("Z")
        elif t.kind in (TZNAME, EPOCH, WEEK, WDAY, CENTURY, GYEAR):
            return None
        elif t.kind in (MONTH_NUM, DAY_NUM, H24, H12, H24C, H11, MINUTE, SECOND) and t.pad in ("-", "_"):
            chunks.append(_SPARK_PATTERN_CHUNK_NOPAD[t.kind])
        else:
            chunk = _SPARK_PATTERN_CHUNK.get(t.kind)
            if chunk is None:
                return None
            chunks.append(chunk)
    return "".join(chunks)
