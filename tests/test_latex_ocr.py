"""LaTeX-OCR ONNX backend (pipelines/latex_ocr.py): the decode loop,
resizer fixed point, tokenizer handling and error surface, driven with
stub sessions (onnxruntime is not in this image — `from_dir` must error
clearly; the session-callable injection point is the test seam)."""

import json

import numpy as np
import pytest

from advancedliteratemachinery_tpu.pipelines.latex_ocr import (
    LatexOcrOnnx,
    _load_tokenizer_vocab,
    post_process,
)

pytestmark = pytest.mark.fast

VOCAB = {"[PAD]": 0, "[BOS]": 1, "[EOS]": 2, "\\frac": 3, "{": 4,
         "}": 5, "x": 6, "y": 7, "Ġ+": 8, "2": 9}
ID2TOK = {i: t for t, i in VOCAB.items()}


def _encoder(feeds):
    x = feeds["input"]
    assert x.ndim == 4 and x.shape[:2] == (1, 1)
    assert x.shape[2] % 32 == 0 and x.shape[3] % 32 == 0
    return [np.zeros((1, 8, 16), np.float32) + x.mean()]


def _decoder_factory(seq):
    """Emit `seq` one token per step (teacher-forced greedy oracle)."""
    def run(feeds):
        ids = feeds["x"]
        t = ids.shape[1] - 1                    # tokens emitted so far
        logits = np.zeros((1, ids.shape[1], len(VOCAB)), np.float32)
        nxt = seq[t] if t < len(seq) else VOCAB["[EOS]"]
        logits[0, -1, nxt] = 10.0
        return [logits]
    return run


class TestDecodeLoop:
    def test_greedy_until_eos(self):
        seq = [VOCAB[t] for t in
               ("\\frac", "{", "x", "}", "{", "y", "}", "Ġ+", "2",
                "[EOS]")]
        m = LatexOcrOnnx(_encoder, _decoder_factory(seq), ID2TOK)
        img = np.full((20, 50, 3), 255, np.uint8)
        out = m(img)
        assert out == "\\frac{x}{y}+2"

    def test_max_len_cap(self):
        never_eos = [VOCAB["x"]] * 10_000
        m = LatexOcrOnnx(_encoder, _decoder_factory(never_eos), ID2TOK,
                         max_len=8)
        assert m(np.zeros((16, 16), np.uint8)) == "x" * 7

    def test_resizer_fixed_point(self):
        calls = {"n": 0}

        def resizer(feeds):
            calls["n"] += 1
            x = feeds["input"]
            out = np.zeros((1, 32), np.float32)
            out[0, 3] = 1.0                     # bucket 4 → width 128
            return [out]

        m = LatexOcrOnnx(_encoder, _decoder_factory([VOCAB["[EOS]"]]),
                         ID2TOK, resizer=resizer)
        m(np.zeros((30, 300), np.uint8))
        # first call predicts 128 ≠ current 320 → resize; second call
        # predicts 128 == current → fixed point, stop
        assert calls["n"] == 2

    def test_pad_gray_bounds(self):
        m = LatexOcrOnnx(_encoder, _decoder_factory([2]), ID2TOK)
        g = m._pad_gray(np.zeros((1000, 5000, 3), np.uint8))
        assert g.shape == (192, 672)            # clamped to max_dims
        g = m._pad_gray(np.zeros((5, 7), np.uint8))
        assert g.shape == (32, 32)              # padded to min_dims
        assert g[10, 10] == 255.0               # white padding


class TestArtifacts:
    def test_tokenizer_json(self, tmp_path):
        p = tmp_path / "tokenizer.json"
        p.write_text(json.dumps({
            "model": {"vocab": VOCAB},
            "added_tokens": [{"id": 99, "content": "[MASK]"}]}))
        id2tok = _load_tokenizer_vocab(str(p))
        assert id2tok[3] == "\\frac" and id2tok[99] == "[MASK]"

    def test_tokenizer_json_wrong_format(self, tmp_path):
        p = tmp_path / "tokenizer.json"
        p.write_text(json.dumps({"not": "a tokenizer"}))
        with pytest.raises(ValueError, match="model.vocab"):
            _load_tokenizer_vocab(str(p))

    def test_from_dir_missing_files(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="encoder_model.onnx"):
            LatexOcrOnnx.from_dir(str(tmp_path))

    def test_from_paths_clear_error_without_onnxruntime(self, tmp_path):
        """This image has no onnxruntime — the error must say so and
        point at the injection alternative (VERDICT r4 item 7)."""
        try:
            import onnxruntime  # noqa: F401
            pytest.skip("onnxruntime installed; error path not reachable")
        except ImportError:
            pass
        tok = tmp_path / "tokenizer.json"
        tok.write_text(json.dumps({"model": {"vocab": VOCAB}}))
        with pytest.raises(ImportError, match="onnxruntime"):
            LatexOcrOnnx.from_paths("enc.onnx", "dec.onnx", str(tok))

    def test_formula_module_from_onnx_surface(self, tmp_path):
        from advancedliteratemachinery_tpu.pipelines.modules import (
            FormulaRecognition)
        with pytest.raises(FileNotFoundError):
            FormulaRecognition.from_onnx(str(tmp_path))


class TestPostProcess:
    def test_whitespace_cleanup(self):
        assert post_process("x ^ { 2 } + 1") == "x^{2}+1"
        # pix2tex removes letter→noletter spaces: '\alpha \beta' loses the
        # space ('a'→'\'), which is render-equivalent LaTeX
        assert post_process("\\alpha \\beta") == "\\alpha\\beta"
        # letter→letter spaces are kept
        assert post_process("a b") == "a b"
