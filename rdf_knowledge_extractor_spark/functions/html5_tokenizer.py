"""WHATWG HTML5 tokenizer (text-extraction-grade, regex-accelerated).

Implements the tokenization stages that determine *which characters
become text nodes and where tag boundaries fall* — the part of the
spec that html5ever (used by the reference via scraper,
ref:src/handlers/mod.rs:109-140) applies before tree construction:

- data state with character-reference decoding (full WHATWG named
  entity table incl. legacy no-semicolon forms, via html.unescape);
- tag open / end tag open / attribute states, including unterminated
  quotes swallowing the rest of the input, bogus comments (``<?``,
  ``</`` + non-alpha), and ``<`` + non-alpha emitted as text;
- comments (``<!--``, ``--!>``, ``<!-->`` empty-comment forms);
- doctype (consumed; name captured for quirks-mode detection);
- RCDATA (title, textarea — entities decoded, tags inert);
- RAWTEXT (style, xmp, iframe, noembed, noframes, and noscript when
  scripting is enabled — html5ever's TreeBuilderOpts default);
- script data incl. the escaped / double-escaped comment dance
  (``<script><!-- </script> --></script>`` does NOT end at the inner
  close tag when double-escaped);
- PLAINTEXT (rest of input is text).

Fast path: bulk regex scans for text runs / well-formed tags; the
character-level state machine only runs for malformed tags.  This
keeps throughput compatible with the fused text+extract pipeline
stage (the scaling-bench hot path).

Tokens are tuples:
    ("text", s)                      s != ""
    ("start", name, attrs, selfclosing)
    ("end", name)
    ("comment", data)                content kept for corpus fidelity
    ("doctype", quirks: bool, name, public_id, system_id)
    ("eof",)
"""

from __future__ import annotations

import html as _html
import re
from html.entities import html5 as _ENTITIES

_WS = "\t\n\f "
# longest entity name (incl. ';') in the WHATWG table
_MAX_ENT = max(len(k) for k in _ENTITIES)

# --- fast-path regexes ------------------------------------------------------

_TEXT_RUN = re.compile(r"[^<]+")
# a well-formed tag: name, then attr text where quoted strings may hide
# '>', no stray quotes outside values (stray quote → slow path)
_TAG_FAST = re.compile(
    r"<(/?)([a-zA-Z][^\t\n\f />]*)"
    r"((?:[\t\n\f ]+[^\t\n\f /><=\"']+"  # attr name (no leading quote)
    r"(?:[\t\n\f ]*=[\t\n\f ]*(?:\"[^\"]*\"|'[^']*'|[^\t\n\f >\"'][^\t\n\f >]*))?"
    # separators may include stray slashes, but a '/' directly before
    # '>' is the self-closing flag (needed verbatim in foreign content)
    r"|[\t\n\f ]+|/(?!>))*)"
    r"(/?)>"
)
_ATTR_ITER = re.compile(
    r"[\t\n\f /]*([^\t\n\f /><=][^\t\n\f /=>]*)"
    r"(?:[\t\n\f ]*=[\t\n\f ]*(?:\"([^\"]*)\"|'([^']*)'|([^\t\n\f >]*)))?"
)
_COMMENT_END = re.compile(r"--!?>")
_AMP = re.compile(r"&")
_NUL = re.compile("\x00")
_RAW_END_CACHE: dict[str, re.Pattern] = {}


_QUIRKY_PUBLIC_PREFIXES = (
    # the web-relevant subset of the WHATWG full-quirks public-id list
    # (§13.2.6.4.1); HTML 4.01 Transitional/Frameset are only full-quirks
    # when the system id is ABSENT — handled below
    "+//silmaril//",
    "-//advasoft ltd//",
    "-//as//dtd html 3.0",
    "-//ietf//dtd html",
    "-//metrius//",
    "-//microsoft//dtd internet explorer",
    "-//netscape comm. corp.//",
    "-//o'reilly and associates//",
    "-//softquad",
    "-//spyglass//",
    "-//sun microsystems corp.//",
    "-//w3c//dtd html 3",
    "-//w3c//dtd html 4.0 frameset//",
    "-//w3c//dtd html 4.0 transitional//",
    "-//w3c//dtd html experimental",
    "-//w3c//dtd w3 html//",
    "-//w3o//dtd w3 html 3.0//",
    "-//webtechs//",
)


def _doctype_fields(body: str) -> tuple[str, str | None, str | None]:
    """(name, public_id, system_id) from the raw doctype body (text
    between 'doctype' and '>'), per WHATWG §13.2.5.53-66: the name is
    ASCII-lowercased; identifier content keeps its original case.
    Feeds the html5lib-format tree serializer (doctype nodes are
    retained for corpus fidelity; quirks detection stays separate)."""
    stripped = body.strip()
    name = stripped.split(None, 1)[0].lower() if stripped else ""
    rest = stripped[len(name):] if stripped else ""
    public_id: str | None = None
    system_id: str | None = None
    m = re.search(r'(?i)public\s*(["\'])(.*?)\1', rest)
    if m:
        public_id = m.group(2)
        after = rest[m.end():]
        m2 = re.search(r'\s*(["\'])(.*?)\1', after)
        if m2:
            system_id = m2.group(2)
    else:
        m3 = re.search(r'(?i)system\s*(["\'])(.*?)\1', rest)
        if m3:
            system_id = m3.group(2)
    return name, public_id, system_id


def _doctype_quirks(body: str) -> bool:
    """Full-quirks detection per WHATWG §13.2.6.4.1 (the part that
    matters for tree construction: quirks mode disables the
    close-p-before-table rule)."""
    low = body.strip().lower()
    name = low.split(None, 1)[0] if low else ""
    if name != "html":
        return True
    m = re.search(r'public\s+(["\'])(.*?)\1', low)
    public_id = m.group(2) if m else None
    has_system = bool(re.search(r'(["\'])[^"\']*\1\s*>?\s*$', low)) and (
        "system" in low or (m is not None and low[m.end():].strip(" >") != "")
    )
    if public_id is None:
        if "system" in low and "about:legacy-compat" not in low:
            sm = re.search(r'system\s+(["\'])(.*?)\1', low)
            if sm and sm.group(2) == "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd":
                return True
        return False
    if public_id in ("-//w3o//dtd w3 html strict 3.0//en//", "-/w3c/dtd html 4.0 transitional/en", "html"):
        return True
    for prefix in _QUIRKY_PUBLIC_PREFIXES:
        if public_id.startswith(prefix):
            return True
    if not has_system and (
        public_id.startswith("-//w3c//dtd html 4.01 frameset//")
        or public_id.startswith("-//w3c//dtd html 4.01 transitional//")
    ):
        return True
    return False


def _preprocess(s: str) -> str:
    if "\r" in s:
        s = s.replace("\r\n", "\n").replace("\r", "\n")
    return s


def _decode_data(s: str) -> str:
    """Character references in data/RCDATA context (html.unescape
    implements the WHATWG rules: longest match, legacy no-semicolon
    names, C1 remapping, out-of-range → U+FFFD)."""
    if "&" not in s:
        return s
    return _html.unescape(s)


def _decode_attr(s: str) -> str:
    """Character references in attribute-value context: a legacy
    (no-semicolon) named reference followed by ``=`` or alphanumeric is
    NOT decoded (WHATWG §13.2.5.73)."""
    if "&" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while True:
        m = _AMP.search(s, i)
        if m is None:
            out.append(s[i:])
            break
        j = m.start()
        out.append(s[i:j])
        # try numeric
        if s[j + 1 : j + 2] == "#":
            mm = re.match(r"#([0-9]{1,8})(;?)|#[xX]([0-9a-fA-F]{1,7})(;?)", s[j + 1 :])
            if mm:
                num = int(mm.group(1), 10) if mm.group(1) else int(mm.group(3), 16)
                out.append(_numeric_ref(num))
                i = j + 1 + mm.end()
                continue
            out.append("&")
            i = j + 1
            continue
        # named: longest match over the entity table
        best = None
        limit = min(n, j + 1 + _MAX_ENT)
        k = j + 1
        name = ""
        while k < limit:
            c = s[k]
            if not (c.isalnum() or c == ";"):
                break
            name += c
            if name in _ENTITIES:
                best = name
            k += 1
            if c == ";":
                break
        if best is None:
            out.append("&")
            i = j + 1
            continue
        if not best.endswith(";"):
            nxt = s[j + 1 + len(best) : j + 2 + len(best)]
            if nxt == "=" or (nxt and nxt.isalnum()):
                # attribute rule: leave undecoded
                out.append("&" + best)
                i = j + 1 + len(best)
                continue
        out.append(_ENTITIES[best])
        i = j + 1 + len(best)
    return "".join(out)


def _numeric_ref(num: int) -> str:
    if num == 0 or num > 0x10FFFF or 0xD800 <= num <= 0xDFFF:
        return "�"
    if num in _html._invalid_charrefs:  # C1 / special remapping
        return _html._invalid_charrefs[num]
    if num in _html._invalid_codepoints:
        return ""
    return chr(num)


class Tokenizer:
    """Pull tokenizer; the tree constructor drives it and may switch it
    into rawtext/rcdata/script/plaintext after a start tag."""

    def __init__(self, source: str):
        self.s = _preprocess(source)
        self.n = len(self.s)
        self.i = 0
        self.mode = "data"  # data | rawtext | rcdata | script | plaintext
        self.raw_tag = ""  # appropriate end tag for rawtext/rcdata/script
        self._pending: list[tuple] = []
        # set by the tree constructor: True while the adjusted current
        # node is in a foreign (svg/math) namespace, where <![CDATA[
        # opens a real CDATA section instead of a bogus comment
        self.cdata_ok = lambda: False

    # tree constructor hook --------------------------------------------------
    def set_content_mode(self, mode: str, tag: str = "") -> None:
        self.mode = mode
        self.raw_tag = tag

    # main loop ---------------------------------------------------------------
    def tokens(self):
        while True:
            t = self.next_token()
            yield t
            if t[0] == "eof":
                return

    def next_token(self) -> tuple:
        if self._pending:
            return self._pending.pop(0)
        if self.i >= self.n:
            return ("eof",)
        mode = self.mode
        if mode == "data":
            return self._data()
        if mode == "plaintext":
            text = self.s[self.i :].replace("\x00", "�")
            self.i = self.n
            return ("text", text) if text else ("eof",)
        if mode == "script":
            return self._script_data()
        return self._raw(rcdata=(mode == "rcdata"))

    # --- data state ----------------------------------------------------------
    def _data(self) -> tuple:
        s, i, n = self.s, self.i, self.n
        if s[i] != "<":
            m = _TEXT_RUN.match(s, i)
            run = m.group()
            self.i = m.end()
            return ("text", _decode_data(run))
        # '<' — dispatch markup
        if s.startswith("<!--", i):
            return self._comment(i + 4)
        if s.startswith("<!", i):
            return self._markup_decl(i + 2)
        if s.startswith("<?", i):
            # spec §13.2.5.6: the '?' ITSELF starts the bogus comment
            # data ("<?php …?>" → comment "?php …?")
            return self._bogus_comment(i + 1)
        nxt = s[i + 1 : i + 2]
        if nxt == "/":
            c2 = s[i + 2 : i + 3]
            if c2 == ">":  # '</>' ignored entirely; skip consecutive runs
                # iteratively (adversarial '</>'*N pages must not recurse)
                i += 3
                while s.startswith("</>", i):
                    i += 3
                self.i = i
                if i >= n:
                    return ("eof",)
                return self._data()
            if not c2:  # EOF after '</' → '</' is text
                self.i = n
                return ("text", "</")
            if not c2.isalpha():
                return self._bogus_comment(i + 2)
            return self._tag(i)
        if nxt.isalpha():
            return self._tag(i)
        if not nxt:  # EOF after '<'
            self.i = n
            return ("text", "<")
        # '<' + non-alpha → text '<', reconsume
        self.i = i + 1
        return ("text", "<")

    # --- tags ------------------------------------------------------------------
    def _tag(self, i: int) -> tuple:
        m = _TAG_FAST.match(self.s, i)
        if m is not None:
            end, name, blob, slash = m.groups()
            self.i = m.end()
            name = name.lower()
            if end:
                return ("end", name)
            return ("start", name, self._attrs(blob), slash == "/")
        return self._tag_slow(i)

    @staticmethod
    def _attrs(blob: str) -> dict:
        if not blob or blob.strip("\t\n\f /") == "":
            return {}
        attrs: dict[str, str] = {}
        for m in _ATTR_ITER.finditer(blob):
            name = m.group(1).lower()
            val = m.group(2)
            if val is None:
                val = m.group(3)
            if val is None:
                val = m.group(4)
            if val is None:
                val = ""
            if name not in attrs:  # first occurrence wins (spec)
                attrs[name] = _decode_attr(val)
        return attrs

    def _tag_slow(self, i: int) -> tuple:
        """Character-level tag states for malformed tags (stray quotes,
        '=' before names, unterminated quoted values → swallow to EOF)."""
        s, n = self.s, self.n
        j = i + 1
        is_end = s[j : j + 1] == "/"
        if is_end:
            j += 1
        # tag name
        k = j
        while k < n and s[k] not in "\t\n\f />":
            k += 1
        name = s[j:k].lower().replace("\x00", "�")
        attrs: dict[str, str] = {}
        selfclosing = False
        while True:
            # before attribute name
            while k < n and s[k] in "\t\n\f /":
                if s[k] == "/":
                    selfclosing = True  # provisional; only final '/' counts
                else:
                    selfclosing = False
                k += 1
            if k >= n:
                self.i = n
                return ("eof",)  # EOF in tag → whole tag dropped
            if s[k] == ">":
                self.i = k + 1
                if is_end:
                    return ("end", name)
                return ("start", name, attrs, selfclosing)
            selfclosing = False
            # attribute name
            a = k
            while k < n and s[k] not in "\t\n\f /=>":
                k += 1
            aname = s[a:k].lower().replace("\x00", "�")
            # after attribute name
            while k < n and s[k] in "\t\n\f ":
                k += 1
            val = ""
            if k < n and s[k] == "=":
                k += 1
                while k < n and s[k] in "\t\n\f ":
                    k += 1
                if k < n and s[k] in "\"'":
                    q = s[k]
                    k += 1
                    v = k
                    while k < n and s[k] != q:
                        k += 1
                    val = s[v:k]
                    if k >= n:  # unterminated quote: swallow to EOF
                        self.i = n
                        return ("eof",)
                    k += 1
                else:
                    v = k
                    while k < n and s[k] not in "\t\n\f >":
                        k += 1
                    val = s[v:k]
            if aname and aname not in attrs:
                attrs[aname] = _decode_attr(val.replace("\x00", "�"))

    # --- comments & declarations ------------------------------------------------
    def _comment(self, body_at: int) -> tuple:
        s = self.s
        # <!--> and <!---> are complete (empty) comments
        if s.startswith(">", body_at):
            self.i = body_at + 1
            return ("comment", "")
        if s.startswith("->", body_at):
            self.i = body_at + 2
            return ("comment", "")
        m = _COMMENT_END.search(s, body_at)
        if m:
            self.i = m.end()
            data = s[body_at : m.start()]
        else:
            self.i = self.n
            data = s[body_at:]  # EOF in comment: rest is data
        return ("comment", data.replace("\x00", "�"))

    def _markup_decl(self, at: int) -> tuple:
        s = self.s
        if s[at : at + 7].lower() == "doctype":
            gt = s.find(">", at)
            body = s[at + 7 : gt if gt != -1 else self.n]
            self.i = (gt + 1) if gt != -1 else self.n
            return ("doctype", _doctype_quirks(body), *_doctype_fields(body))
        if s.startswith("[CDATA[", at):
            if self.cdata_ok():
                # foreign content: literal text to ']]>' (no entity
                # decoding; NULLs handled by the tree's foreign rules)
                end = s.find("]]>", at + 7)
                stop = end if end != -1 else self.n
                self.i = (end + 3) if end != -1 else self.n
                data = s[at + 7 : stop]
                return ("text", data) if data else self.next_token()
            # HTML content: bogus comment spanning to the first '>'
            return self._bogus_comment(at)
        return self._bogus_comment(at)

    def _bogus_comment(self, at: int) -> tuple:
        gt = self.s.find(">", at)
        self.i = (gt + 1) if gt != -1 else self.n
        data = self.s[at : gt if gt != -1 else self.n]
        return ("comment", data.replace("\x00", "�"))

    # --- RAWTEXT / RCDATA ------------------------------------------------------
    def _raw(self, rcdata: bool) -> tuple:
        s, i = self.s, self.i
        tag = self.raw_tag
        pat = _RAW_END_CACHE.get(tag)
        if pat is None:
            pat = re.compile(rf"</{re.escape(tag)}(?=[\t\n\f />])", re.I)
            _RAW_END_CACHE[tag] = pat
        m = pat.search(s, i)
        if m is None:
            text = s[i:]
            self.i = self.n
            self.mode = "data"
            text = _NUL.sub("�", text)
            if rcdata:
                text = _decode_data(text)
            return ("text", text) if text else ("eof",)
        text = _NUL.sub("�", s[i : m.start()])
        if rcdata:
            text = _decode_data(text)
        # consume the end tag (attrs permitted, ignored)
        tm = _TAG_FAST.match(s, m.start())
        if tm is not None:
            self.i = tm.end()
        else:
            gt = s.find(">", m.start())
            self.i = (gt + 1) if gt != -1 else self.n
        self.mode = "data"
        if text:
            self._pending.append(("end", tag))
            return ("text", text)
        return ("end", tag)

    # --- script data (escaped / double-escaped) ---------------------------------
    def _script_data(self) -> tuple:
        s, i, n = self.s, self.i, self.n
        sig = re.compile(
            r"<!--|-->|</script(?=[\t\n\f />])|<script(?=[\t\n\f />])", re.I
        )
        state = "normal"  # normal | escaped | double
        pos = i
        end_at = None  # (text_end, resume_at)
        while True:
            m = sig.search(s, pos)
            if m is None:
                break
            tok = m.group().lower()
            if tok == "<!--":
                if state == "normal":
                    state = "escaped"
                pos = m.end()
            elif tok == "-->":
                if state in ("escaped", "double"):
                    state = "normal"
                pos = m.end()
            elif tok == "<script":
                if state == "escaped":
                    state = "double"
                pos = m.end()
            else:  # "</script"
                if state == "double":
                    state = "escaped"
                    pos = m.end()
                else:
                    end_at = m.start()
                    break
        self.mode = "data"
        if end_at is None:
            text = _NUL.sub("�", s[i:])
            self.i = n
            return ("text", text) if text else ("eof",)
        text = _NUL.sub("�", s[i:end_at])
        tm = _TAG_FAST.match(s, end_at)
        if tm is not None:
            self.i = tm.end()
        else:
            gt = s.find(">", end_at)
            self.i = (gt + 1) if gt != -1 else n
        if text:
            self._pending.append(("end", "script"))
            return ("text", text)
        return ("end", "script")
