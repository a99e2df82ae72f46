"""Golden-transcript regression tests.

The reference's only verification oracle is its committed run logs
(``FinalCode/New/*.log`` — SURVEY §4): full stdout of real runs, diffed by
eye across changes.  These tests are that oracle made mechanical: each tiny
pipeline runs with fixed seeds (threefry streams — ``test_fame_run_
determinism`` proves bit-reproducibility), its stdout is normalized (wall
times vary) and diffed LINE BY LINE, numbers included, against a committed
transcript in ``tests/golden/``.  Any metric or output-format drift fails.

Regenerate after an intentional behavior change with:

    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q

and review the transcript diff like a code change.
"""

import contextlib
import io
import os
import re

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

_TIME_RE = re.compile(r"\(\d+(\.\d+)?s\)")


def _normalize(text: str) -> str:
    lines = [_TIME_RE.sub("(Ts)", ln.rstrip()) for ln in text.splitlines()]
    return "\n".join(lines) + "\n"


def _check_or_regen(name: str, transcript: str):
    path = os.path.join(GOLDEN_DIR, name)
    got = _normalize(transcript)
    if os.environ.get("GOLDEN_REGEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(got)
        pytest.skip(f"regenerated {name}")
    if not os.path.exists(path):
        pytest.fail(f"golden transcript {name} missing — run with "
                    f"GOLDEN_REGEN=1 to create it")
    with open(path) as f:
        want = f.read()
    if got != want:
        import difflib

        diff = "\n".join(difflib.unified_diff(
            want.splitlines(), got.splitlines(), "golden", "current",
            lineterm=""))
        pytest.fail(f"transcript drift for {name}:\n{diff}")


def _tiny_text(vocab=256):
    from fairmultimodal_tpu.models.bert import BertConfig
    from fairmultimodal_tpu.models.text import TextEncoder

    return TextEncoder.from_pretrained(
        "offline/none",
        fallback_config=BertConfig(vocab_size=vocab, hidden_size=32,
                                   num_hidden_layers=1, num_attention_heads=2,
                                   intermediate_size=64,
                                   max_position_embeddings=64))


@pytest.mark.slow
def test_golden_fame_transcript():
    from fairmultimodal_tpu.data.synthetic import make_common_frames
    from fairmultimodal_tpu.pipelines.fame import (
        FAMEPipelineConfig,
        run_fame_experiment,
    )
    from fairmultimodal_tpu.train.loop import TrainConfig

    s, u = make_common_frames(n_patients=96, n_lab_features=8, seed=5)
    cfg = FAMEPipelineConfig(
        train=TrainConfig(lr=1e-3, num_epochs=2, batch_size=32,
                          rng_impl="threefry"),
        text_max_length=32, text_batch_size=16, hidden_size=32,
        demo_layers=1, demo_heads=2, lab_layers=1, lab_heads=2,
        fusion_hidden=16, save_artifacts=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_fame_experiment(s, u, cfg, text_encoder=_tiny_text(), verbose=True)
    _check_or_regen("fame_tiny.log", buf.getvalue())


@pytest.mark.slow
def test_golden_behrt_transcript():
    from fairmultimodal_tpu.data.synthetic import make_common_frames
    from fairmultimodal_tpu.pipelines import (
        BEHRTPipelineConfig,
        run_behrt_experiment,
    )

    s, u = make_common_frames(n_patients=96, n_lab_features=8, seed=5)
    cfg = BEHRTPipelineConfig(hidden_size=32)
    cfg.train.num_epochs = 2
    cfg.train.batch_size = 32
    cfg.train.rng_impl = "threefry"
    for attr, v in (("num_hidden_layers", 1), ("demo_layers", 1),
                    ("lab_layers", 1), ("num_attention_heads", 2),
                    ("demo_heads", 2), ("lab_heads", 2)):
        if hasattr(cfg, attr):
            setattr(cfg, attr, v)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_behrt_experiment(s, u, cfg, verbose=True)
    _check_or_regen("behrt_tiny.log", buf.getvalue())


@pytest.mark.slow
def test_golden_text_only_transcript():
    from fairmultimodal_tpu.data.synthetic import make_common_frames
    from fairmultimodal_tpu.pipelines import (
        TextOnlyPipelineConfig,
        run_text_only_experiment,
    )

    s, u = make_common_frames(n_patients=96, n_lab_features=8, seed=5)
    cfg = TextOnlyPipelineConfig(text_max_length=32, text_batch_size=16)
    cfg.train.num_epochs = 2
    cfg.train.batch_size = 32
    cfg.train.rng_impl = "threefry"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_text_only_experiment(s, u, cfg, text_encoder=_tiny_text(),
                                 verbose=True)
    _check_or_regen("text_only_tiny.log", buf.getvalue())
