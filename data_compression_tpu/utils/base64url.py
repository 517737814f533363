"""base64url digit tables and printable armor.

Reference analogues:
* ``int2digit`` / ``digit2int`` (n_ary_huffman.c:371-455): RFC 4648
  base64url digit alphabet, with the decoder accepting the standard
  ``+ /`` variants for 62/63 alongside ``- _`` — reproduced exactly.
* ``printable_compression.py`` (an empty 18-line stub in the reference,
  dated 2025-07-01) and the unimplemented COMPRESSED_TEXT_IS_PRINTABLE
  mode (small_compression.c:38): here realized as a whole-stream armor:
  any framed stream becomes pure printable ASCII (and back), so
  compressed data can ride in source code, logs, or the author's
  "signature program" use case (nybble_compression.c:1080-1086).

Armor format: 'D' 'C' '1' header, then base64url of the payload, 76
chars per line, '.' terminator.
"""

from __future__ import annotations

_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
    "0123456789"
    "-_"
)
_DECODE = {c: i for i, c in enumerate(_ALPHABET)}
# the reference's digit2int also accepts the RFC 4648 standard pair
# (n_ary_huffman.c:444-447)
_DECODE["+"] = 62
_DECODE["/"] = 63

_MAGIC = "DC1"
_LINE = 76


def int2digit(i: int) -> str:
    """n_ary_huffman.c:371-428."""
    if not 0 <= i < 64:
        raise ValueError("digit out of range")
    return _ALPHABET[i]


def digit2int(c: str) -> int:
    """n_ary_huffman.c:430-455."""
    try:
        return _DECODE[c]
    except KeyError:
        raise ValueError(f"not a base64url digit: {c!r}") from None


def armor(data: bytes) -> str:
    """Encode bytes as printable base64url text."""
    digits = []
    acc = 0
    nbits = 0
    for b in data:
        acc = (acc << 8) | b
        nbits += 8
        while nbits >= 6:
            nbits -= 6
            digits.append(_ALPHABET[(acc >> nbits) & 63])
    if nbits:
        digits.append(_ALPHABET[(acc << (6 - nbits)) & 63])
    body = "".join(digits)
    lines = [
        body[i : i + _LINE] for i in range(0, max(len(body), 1), _LINE)
    ] or [""]
    return _MAGIC + ":" + str(len(data)) + "\n" + "\n".join(lines) + "\n.\n"


def dearmor(text: str) -> bytes:
    """Inverse of armor (whitespace-tolerant)."""
    head, _, rest = text.partition("\n")
    if not head.startswith(_MAGIC + ":"):
        raise ValueError("bad armor header")
    nbytes = int(head[len(_MAGIC) + 1 :])
    acc = 0
    nbits = 0
    out = bytearray()
    for c in rest:
        if c in " \t\r\n":
            continue
        if c == ".":
            break
        acc = (acc << 6) | digit2int(c)
        nbits += 6
        if nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if len(out) < nbytes:
        raise ValueError("truncated armor")
    return bytes(out[:nbytes])


# --- Z85 armor -------------------------------------------------------
# The reference carries dormant Ascii85/Z85 digit tables inside an
# ``#if(0)`` block of int2digit (n_ary_huffman.c:371-428, the author's
# noted alternative alphabets).  Realized here as a working armor
# variant: ZeroMQ Z85 (4 bytes -> 5 printable chars, 25% overhead vs
# base64url's 33%).

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85)}
_Z85_MAGIC = "DCZ"


def z85_core(data: bytes) -> str:
    """Raw Z85 body (no frame lines): ceil(len/4)*5 chars — the
    deterministic length makes per-block armored spans computable from
    the binary block table (framing.frame_to_printable)."""
    pad = (-len(data)) % 4
    buf = data + b"\x00" * pad
    digits = []
    for i in range(0, len(buf), 4):
        v = int.from_bytes(buf[i : i + 4], "big")
        for p in (85**4, 85**3, 85**2, 85, 1):
            digits.append(_Z85[(v // p) % 85])
    return "".join(digits)


def z85_core_len(nbytes: int) -> int:
    return -(-nbytes // 4) * 5


def z85_core_decode(text: str, nbytes: int) -> bytes:
    """Inverse of z85_core: decode exactly nbytes from its armored span."""
    if len(text) != z85_core_len(nbytes):
        raise ValueError("bad z85 span length")
    out = bytearray()
    try:
        for i in range(0, len(text), 5):
            v = 0
            for c in text[i : i + 5]:
                v = v * 85 + _Z85_DECODE[c]
            if v > 0xFFFFFFFF:
                raise ValueError("z85 group overflow")
            out.extend(v.to_bytes(4, "big"))
    except KeyError as e:
        raise ValueError(f"bad z85 digit {e}") from None
    return bytes(out[:nbytes])


def z85_armor(data: bytes) -> str:
    """Encode bytes as Z85 text (frame: 'DCZ:<len>\\n' body '\\n~\\n')."""
    pad = (-len(data)) % 4
    buf = data + b"\x00" * pad
    digits = []
    for i in range(0, len(buf), 4):
        v = int.from_bytes(buf[i : i + 4], "big")
        for p in (85**4, 85**3, 85**2, 85, 1):
            digits.append(_Z85[(v // p) % 85])
    body = "".join(digits)
    lines = [body[i : i + _LINE] for i in range(0, max(len(body), 1), _LINE)] or [""]
    return _Z85_MAGIC + ":" + str(len(data)) + "\n" + "\n".join(lines) + "\n~\n"


# --- Ascii85 armor ----------------------------------------------------
# The other dormant alphabet in the reference's #if(0) block
# (n_ary_huffman.c:371-428): btoa/Adobe Ascii85, chars '!'..'u' plus the
# 'z' shorthand for an all-zero group.

_A85_MAGIC = "DCA"


def ascii85_armor(data: bytes) -> str:
    """Encode bytes as Ascii85 (frame: 'DCA:<len>\\n' body '\\n~\\n');
    all-zero 4-byte groups emit the classic 'z' shorthand."""
    pad = (-len(data)) % 4
    buf = data + b"\x00" * pad
    digits = []
    for i in range(0, len(buf), 4):
        v = int.from_bytes(buf[i : i + 4], "big")
        if v == 0:
            digits.append("z")
            continue
        for p in (85**4, 85**3, 85**2, 85, 1):
            digits.append(chr(33 + (v // p) % 85))
    body = "".join(digits)
    lines = [body[i : i + _LINE] for i in range(0, max(len(body), 1), _LINE)] or [""]
    return _A85_MAGIC + ":" + str(len(data)) + "\n" + "\n".join(lines) + "\n~\n"


def ascii85_dearmor(text: str) -> bytes:
    """Inverse of ascii85_armor (whitespace-tolerant)."""
    head, _, rest = text.partition("\n")
    if not head.startswith(_A85_MAGIC + ":"):
        raise ValueError("bad ascii85 armor header")
    nbytes = int(head[len(_A85_MAGIC) + 1 :])
    out = bytearray()
    group = 0
    ndig = 0
    for c in rest:
        if c in " \t\r\n":
            continue
        if c == "~":
            break
        if c == "z":
            if ndig:
                raise ValueError("'z' inside an ascii85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not ("!" <= c <= "u"):
            raise ValueError(f"not an ascii85 digit: {c!r}")
        group = group * 85 + (ord(c) - 33)
        ndig += 1
        if ndig == 5:
            out += group.to_bytes(4, "big")
            group = 0
            ndig = 0
    if ndig:
        raise ValueError("truncated ascii85 group")
    if len(out) < nbytes:
        raise ValueError("truncated armor")
    return bytes(out[:nbytes])


def z85_dearmor(text: str) -> bytes:
    """Inverse of z85_armor (whitespace-tolerant)."""
    head, _, rest = text.partition("\n")
    if not head.startswith(_Z85_MAGIC + ":"):
        raise ValueError("bad z85 armor header")
    nbytes = int(head[len(_Z85_MAGIC) + 1 :])
    out = bytearray()
    group = 0
    ndig = 0
    for c in rest:
        if c in " \t\r\n":
            continue
        if c == "~":
            break
        try:
            group = group * 85 + _Z85_DECODE[c]
        except KeyError:
            raise ValueError(f"not a z85 digit: {c!r}") from None
        ndig += 1
        if ndig == 5:
            out += group.to_bytes(4, "big")
            group = 0
            ndig = 0
    if ndig:
        raise ValueError("truncated z85 group")
    if len(out) < nbytes:
        raise ValueError("truncated armor")
    return bytes(out[:nbytes])
