from omni_recall_tpu.extract.pdf import NoOpOcrTextExtractor, PdfTextExtractor  # noqa: F401
