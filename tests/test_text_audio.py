"""Tokenizer, normalizer, WER, mel and FLAC tests."""
import glob
import hashlib
import os

import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu.audio import (log_mel_spectrogram,
                                                mel_filters, pad_or_trim,
                                                read_flac)
from eddie_wang_hackathon2023_tpu.text.normalizers import (
    BasicTextNormalizer, EnglishTextNormalizer)
from eddie_wang_hackathon2023_tpu.text.tokenizer import get_tokenizer
from eddie_wang_hackathon2023_tpu.text.wer import wer

REF_WHISPER = ("/root/reference/tensorrt_llm_july-release-v1/examples/"
               "whisper")


class TestTokenizer:

    def test_special_token_ids_multilingual(self):
        tok = get_tokenizer(True, language="en", task="transcribe")
        # well-known Whisper multilingual ids
        assert tok.sot == 50258
        assert tok.eot == 50257
        assert tok.transcribe == 50359
        assert tok.translate == 50358
        assert tok.no_timestamps == 50363
        assert tok.timestamp_begin == 50364
        assert tok.language_token == 50259  # <|en|>
        assert tok.sot_sequence == (50258, 50259, 50359)

    def test_roundtrip(self):
        tok = get_tokenizer(True, language="en", task="transcribe")
        text = "Hello, world! This is a test."
        ids = tok.encode(text)
        assert tok.decode(ids) == text

    def test_timestamps_stripped_in_decode(self):
        tok = get_tokenizer(True, language="en", task="transcribe")
        ids = tok.encode("hi") + [tok.timestamp_begin + 5]
        assert tok.decode(ids) == "hi"
        assert "<|0.10|>" in tok.decode_with_timestamps(ids)

    def test_non_speech_tokens_nonempty(self):
        tok = get_tokenizer(True, language="en", task="transcribe")
        nst = tok.non_speech_tokens
        assert len(nst) > 20 and all(isinstance(t, int) for t in nst)

    def test_language_tokens(self):
        tok = get_tokenizer(True, language="fr", task="transcribe")
        assert tok.sot_sequence[1] == tok.language_token
        assert len(tok.all_language_tokens) == 99


class TestNormalizer:

    @pytest.fixture(scope="class")
    def norm(self):
        return EnglishTextNormalizer()

    @pytest.mark.parametrize("inp,out", [
        ("HE HOPED THERE WOULD BE STEW FOR DINNER",
         "he hoped there would be stew for dinner"),
        ("Mr. Quilter is the apostle.", "mister quilter is the apostle"),
        ("he won't go; she'll stay", "he will not go she will stay"),
        ("nineteen sixty four", "1964"),
        ("one hundred and five", "105"),
        ("twenty twenty", "2020"),
        ("one oh one dalmatians", "101 dalmatians"),
        ("the colour of the aeroplane was grey",
         "the color of the airplane was gray"),
        ("it's the 1960s!", "it is the 1960s"),
        ("the twenty second", "the 22nd"),
        ("three and a half", "3.5"),
        ("one hundred twenty three dollars", "$123"),
        ("five percent", "5%"),
        ("one thousand nine hundred eighty four", "1984"),
    ])
    def test_english_cases(self, norm, inp, out):
        assert norm(inp) == out

    def test_basic_normalizer(self):
        bn = BasicTextNormalizer()
        assert bn("Hello, World! (noise)") == "hello world"

    @pytest.mark.skipif(not os.path.isdir(REF_WHISPER),
                        reason="reference dataset not mounted")
    def test_matches_reference_normalizer_on_real_transcripts(self, norm):
        import sys
        sys.path.insert(0, REF_WHISPER)
        try:
            from normalizers import EnglishTextNormalizer as RefNorm
        except ImportError:
            pytest.skip("reference normalizer import failed")
        ref = RefNorm()
        path = os.path.join(REF_WHISPER, "LibriSpeech/valid-clean/"
                            "valid.trans.txt")
        with open(path) as f:
            texts = [" ".join(l.split()[1:]) for l in f if l.strip()]
        assert texts
        for t in texts:
            assert norm(t) == ref(t)


class TestWER:

    def test_perfect(self):
        assert wer(["a b c"], ["a b c"]) == 0.0

    def test_substitution(self):
        assert wer(["a b c d"], ["a x c d"]) == 0.25

    def test_insert_delete(self):
        assert wer(["a b"], ["a b c"]) == 0.5
        assert wer(["a b c"], ["a c"]) == pytest.approx(1 / 3)

    def test_corpus_weighting(self):
        # corpus WER = total errors / total ref words (not mean of rates)
        assert wer(["a", "b c d e f g h i j"],
                   ["x", "b c d e f g h i j"]) == 0.1


class TestAudio:

    def test_mel_filters_match_reference_npz(self):
        path = os.path.join(REF_WHISPER, "assets/mel_filters.npz")
        if not os.path.exists(path):
            pytest.skip("reference assets not mounted")
        ref = np.load(path)["mel_80"]
        np.testing.assert_allclose(mel_filters(), ref, atol=1e-7)

    def test_pad_or_trim(self):
        assert pad_or_trim(np.ones(10), 16).shape == (16,)
        assert pad_or_trim(np.ones(20), 16).shape == (16,)

    def test_log_mel_shape_and_range(self):
        audio = np.random.RandomState(0).randn(48000).astype(np.float32) * 0.1
        mel = log_mel_spectrogram(audio)
        assert mel.shape == (80, 300)
        assert mel.min() >= (mel.max() - 8.0) / 4.0 - 1.0

    @pytest.mark.skipif(not os.path.isdir(REF_WHISPER),
                        reason="reference dataset not mounted")
    def test_flac_bitexact_md5(self):
        """STREAMINFO carries the MD5 of the raw PCM — decode must match."""
        files = sorted(glob.glob(os.path.join(
            REF_WHISPER, "LibriSpeech/valid-clean/*.flac")))[:5]
        assert files
        from eddie_wang_hackathon2023_tpu.native import flac as nflac
        import ctypes
        lib = nflac._lib()
        for path in files:
            with open(path, "rb") as f:
                data = f.read()
            pos = 4
            md5_want = None
            while True:
                hdr = data[pos]
                length = int.from_bytes(data[pos + 1:pos + 4], "big")
                if (hdr & 0x7F) == 0:
                    md5_want = data[pos + 4:pos + 4 + length][18:34]
                pos += 4 + length
                if hdr & 0x80:
                    break
            samples = ctypes.POINTER(ctypes.c_int32)()
            n = ctypes.c_int64()
            sr = ctypes.c_int()
            ch = ctypes.c_int()
            bps = ctypes.c_int()
            rc = lib.ewt_flac_decode(path.encode(), ctypes.byref(samples),
                                     ctypes.byref(n), ctypes.byref(sr),
                                     ctypes.byref(ch), ctypes.byref(bps))
            assert rc == 0
            arr = np.ctypeslib.as_array(samples,
                                        shape=(n.value * ch.value,)).copy()
            lib.ewt_flac_free(samples)
            assert hashlib.md5(arr.astype("<i2").tobytes()).digest() == md5_want

    @pytest.mark.skipif(not os.path.isdir(REF_WHISPER),
                        reason="reference dataset not mounted")
    def test_read_flac_float_contract(self):
        files = sorted(glob.glob(os.path.join(
            REF_WHISPER, "LibriSpeech/valid-clean/*.flac")))
        a = read_flac(files[0])
        assert a.dtype == np.float32
        assert np.abs(a).max() <= 1.0
