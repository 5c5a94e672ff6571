"""PDF text extraction.

Mirrors the reference's extractor shape
(src/OmniRecall.Api/Services/PdfPigTextExtractor.cs:16-56): extract text from
the PDF; when parsing fails or the result is shorter than
``Ocr:PdfTextMinChars`` (default 120), fall back to the pluggable OCR
extractor (``NoOpOcrTextExtractor`` by default, returning empty — reference
NoOpOcrTextExtractor.cs:9).

No third-party PDF library is available in this environment, so the built-in
parser handles the common machine-generated case directly: Flate-compressed or
plain content streams with ``Tj``/``TJ``/``'`` text-showing operators and
PDFDocEncoding/latin-1 string literals (incl. escape sequences and octal
codes). Exotic encodings (CID fonts, hex strings with custom CMaps) fall
through to OCR/empty, exactly like a PdfPig parse failure would.
"""

from __future__ import annotations

import re
import zlib


class NoOpOcrTextExtractor:
    def extract_text(self, data: bytes) -> str:
        return ""


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
# string literal (with escaped chars) followed by a text-showing operator
_TJ_RE = re.compile(rb"\((?:\\.|[^\\()])*\)\s*(?:Tj|')")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ", re.DOTALL)
_STRING_RE = re.compile(rb"\((?:\\.|[^\\()])*\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    # raw includes the surrounding parentheses
    body = raw[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        ch = body[i : i + 1]
        if ch == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if 0x30 <= body[i + 1] <= 0x37:  # octal escape \d{1,3}
                j = i + 1
                digits = b""
                while j < len(body) and len(digits) < 3 and 0x30 <= body[j] <= 0x37:
                    digits += body[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation or unknown escape: skip backslash
            continue
        out += ch
        i += 1
    return out.decode("latin-1", errors="replace")


def _extract_stream_text(stream: bytes) -> list[str]:
    pieces: list[str] = []
    for match in _TJ_RE.finditer(stream):
        literal = _STRING_RE.match(match.group(0))
        if literal:
            pieces.append(_decode_pdf_string(literal.group(0)))
    for match in _TJ_ARRAY_RE.finditer(stream):
        parts = [_decode_pdf_string(s.group(0)) for s in _STRING_RE.finditer(match.group(1))]
        if parts:
            pieces.append("".join(parts))
    return pieces


def extract_pdf_text(data: bytes) -> str:
    if not data.lstrip().startswith(b"%PDF"):
        raise ValueError("Not a PDF document.")
    pieces: list[str] = []
    for match in _STREAM_RE.finditer(data):
        stream = match.group(1)
        try:
            stream = zlib.decompress(stream)
        except zlib.error:
            pass  # uncompressed or unsupported filter; try as-is
        pieces.extend(_extract_stream_text(stream))
    return "\n".join(p for p in pieces if p.strip()).strip()


class PdfTextExtractor:
    def __init__(self, ocr_extractor=None, pdf_text_min_chars: int = 120) -> None:
        self.ocr = ocr_extractor or NoOpOcrTextExtractor()
        self.min_chars = pdf_text_min_chars

    def extract_text(self, data: bytes) -> str:
        text = ""
        try:
            text = extract_pdf_text(data)
        except Exception:
            text = ""
        if len(text) >= self.min_chars:
            return text
        ocr_text = self.ocr.extract_text(data)
        # Prefer whichever attempt produced content (reference: OCR result is
        # returned when the parsed text is too short, PdfPigTextExtractor.cs:33-40)
        return ocr_text if ocr_text.strip() else text
