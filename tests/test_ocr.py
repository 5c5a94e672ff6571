"""OCR client tests with scripted transports (mirror of the reference's OCR
fallback semantics: all failures return empty, success returns content)."""

import json

from omni_recall_tpu.config import OcrOptions
from omni_recall_tpu.extract.ocr import DocumentIntelligenceOcrTextExtractor
from omni_recall_tpu.extract.pdf import PdfTextExtractor
from omni_recall_tpu.ingest.embedding import SimpleHttpResponse


class ScriptedTransport:
    def __init__(self, steps):
        self.steps = list(steps)
        self.calls = []

    def __call__(self, method, url, headers, body, timeout):
        self.calls.append((method, url))
        status, payload, resp_headers = self.steps.pop(0)
        if isinstance(payload, dict):
            payload = json.dumps(payload).encode()
        elif isinstance(payload, str):
            payload = payload.encode()
        return SimpleHttpResponse(status, payload, resp_headers or {})


OPTS = OcrOptions(provider="DocumentIntelligence", endpoint="https://ocr.example",
                  key="k", poll_ms=0, max_poll_attempts=5)


def _extractor(steps):
    return DocumentIntelligenceOcrTextExtractor(
        OPTS, ScriptedTransport(steps), sleep=lambda s: None
    )


def test_ocr_success_after_polling():
    steps = [
        (202, "", {"operation-location": "https://ocr.example/op/1"}),
        (200, {"status": "running"}, {}),
        (200, {"status": "succeeded", "analyzeResult": {"content": "  extracted text "}}, {}),
    ]
    assert _extractor(steps).extract_text(b"%PDF") == "extracted text"


def test_ocr_root_content_fallback():
    steps = [
        (202, "", {"operation-location": "https://ocr.example/op/1"}),
        (200, {"status": "succeeded", "content": "root content"}, {}),
    ]
    assert _extractor(steps).extract_text(b"%PDF") == "root content"


def test_ocr_rejection_and_failure_return_empty():
    assert _extractor([(401, "", {})]).extract_text(b"x") == ""
    assert _extractor([(500, "", {})]).extract_text(b"x") == ""
    steps = [
        (202, "", {"operation-location": "https://ocr.example/op/1"}),
        (200, {"status": "failed"}, {}),
    ]
    assert _extractor(steps).extract_text(b"x") == ""


def test_ocr_missing_operation_location_returns_empty():
    assert _extractor([(202, "", {})]).extract_text(b"x") == ""


def test_ocr_poll_timeout_returns_empty():
    steps = [(202, "", {"operation-location": "https://ocr.example/op/1"})]
    steps += [(200, {"status": "running"}, {})] * 5
    assert _extractor(steps).extract_text(b"x") == ""


def test_ocr_unconfigured_is_noop():
    ext = DocumentIntelligenceOcrTextExtractor(OcrOptions(), ScriptedTransport([]))
    assert ext.extract_text(b"x") == ""


def test_pdf_extractor_falls_back_to_ocr_on_short_text():
    ocr = _extractor([
        (202, "", {"operation-location": "https://ocr.example/op/1"}),
        (200, {"status": "succeeded", "analyzeResult": {"content": "ocr words"}}, {}),
    ])
    pdf = PdfTextExtractor(ocr, pdf_text_min_chars=120)
    # a PDF whose parsed text is shorter than min chars -> OCR result used
    data = b"%PDF-1.4\nstream\n(short) Tj\nendstream"
    assert pdf.extract_text(data) == "ocr words"
