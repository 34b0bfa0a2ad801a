from pangu_tpu.eval.evaluate import evaluate, make_score_step  # noqa: F401
