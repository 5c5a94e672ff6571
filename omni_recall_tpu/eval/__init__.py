from omni_recall_tpu.eval.harness import EvalHarness, EvalCase  # noqa: F401
