"""Eval subsystem tests: NLG metrics + CE metrics + CSV byte-compat.

sklearn comparisons pin the CE metric definitions to the exact functions the
reference calls (test.py:406-421); BLEU/ROUGE cases are hand-computed.
"""
import math

import numpy as np
import pytest

from radialog_tpu.eval.ce_metrics import (CHEXBERT_CONDITIONS, CHEXPERT_COLS,
                                          ce_metrics,
                                          class_ids_to_label_matrix,
                                          map_labels_for_scoring,
                                          read_labels_csv, write_labels_csv,
                                          write_predictions_csv)
from radialog_tpu.eval.nlg import (corpus_bleu, evaluate_reports,
                                   meteor_corpus, rouge_l_corpus,
                                   tokenize_report)


class TestNLG:
    def test_tokenize(self):
        toks = tokenize_report("The lungs are clear. No effusion, <s>stable</s>.")
        assert toks[:5] == ["the", "lungs", "are", "clear", "."]
        assert "," in toks and "<s>" not in " ".join(toks)

    def test_tokenize_newline_glue_matches_reference(self):
        # the reference's preprocess strips '\n' with no space, gluing
        # adjacent sentences (ReportDataset.py:401-405) — keep that contract
        toks = tokenize_report("clear.\nNo effusion.")
        assert toks[0] == "clear.no"

    def test_bleu_identical_is_one(self):
        gts = {"a": [["the", "cat", "sat", "on", "the", "mat"]]}
        res = {"a": ["the", "cat", "sat", "on", "the", "mat"]}
        b = corpus_bleu(gts, res)
        for v in b:
            assert abs(v - 1.0) < 1e-6

    def test_bleu1_hand_computed(self):
        # hyp: 4 tokens, 3 clipped unigram matches, same length -> BP=1
        gts = {"a": [["the", "cat", "sat", "down"]]}
        res = {"a": ["the", "cat", "sat", "up"]}
        b = corpus_bleu(gts, res)
        assert abs(b[0] - 0.75) < 1e-6

    def test_bleu_brevity_penalty(self):
        gts = {"a": [["a", "b", "c", "d", "e", "f"]]}
        res = {"a": ["a", "b", "c"]}
        b1 = corpus_bleu(gts, res)[0]
        assert abs(b1 - math.exp(1 - 6 / 3)) < 1e-6  # precision 1, bp=e^-1

    def test_rouge_l(self):
        # LCS("the cat sat", "the cat stood") = 2; P=2/3 R=2/3 -> F=2/3
        gts = {"a": [["the", "cat", "stood"]]}
        res = {"a": ["the", "cat", "sat"]}
        assert abs(rouge_l_corpus(gts, res) - 2 / 3) < 1e-6

    def test_meteor_identical(self):
        gts = {"a": [["lungs", "are", "clear"]]}
        res = {"a": ["lungs", "are", "clear"]}
        # one chunk, m=3: penalty = .5*(1/3)^3; fmean=1
        assert abs(meteor_corpus(gts, res) - (1 - 0.5 / 27)) < 1e-6

    def test_meteor_stem_match(self):
        gts = {"a": [["the", "cars", "raced"]]}
        res = {"a": ["the", "car", "raced"]}
        assert meteor_corpus(gts, res) > 0.8  # 'car' matches 'cars' via stem

    def test_meteor_synonym_match(self):
        # 'unremarkable' aligns to 'normal' via the vendored synonym stage
        gts = {"a": [["the", "heart", "is", "normal"]]}
        res = {"a": ["the", "heart", "is", "unremarkable"]}
        without = meteor_corpus(gts, res, synonyms={})
        with_syn = meteor_corpus(gts, res)
        assert with_syn > without

    def test_meteor_matches_nltk_implementation(self):
        """Bit-identical to nltk's meteor_score given the same synonym data.

        nltk's implementation is importable but its WordNet *data* is not
        (offline container), so we inject METEOR_SYNONYMS as a wordnet
        substitute implementing the exact API surface meteor_score touches
        (synsets -> lemmas -> name, '_'-filtered). This pins our alignment
        tie-breaking (reverse hypothesis scan, latest reference position),
        chunk counting, and score formula to nltk's — isolating any residual
        METEOR deviation vs the reference's Java jar to synonym/paraphrase
        table coverage only.
        """
        from nltk.translate.meteor_score import single_meteor_score

        from radialog_tpu.eval.nlg import (METEOR_SYNONYMS, _meteor_segment,
                                           tokenize_report)

        class _Lemma:
            def __init__(self, n):
                self._n = n

            def name(self):
                return self._n

        class _Synset:
            def __init__(self, words):
                self._lemmas = [_Lemma(w) for w in words]

            def lemmas(self):
                return self._lemmas

        # one synset per word carrying its full (stem-closed) synonym set —
        # METEOR_SYNONYMS is symmetric, so this is group membership
        class _FakeWordnet:
            @staticmethod
            def synsets(word):
                syns = METEOR_SYNONYMS.get(word)
                return [_Synset(sorted(syns))] if syns else []

        cases = [
            # (hypothesis, reference) — realistic report text incl. synonym
            # substitutions, reorderings, drops, and degenerate overlaps
            ("The lungs are clear. No pleural effusion or pneumothorax.",
             "The lungs are clear. No pleural effusion or pneumothorax."),
            ("Heart size is unremarkable. No pleural fluid.",
             "The cardiac silhouette is normal. No pleural effusion."),
            ("Small right effusion is seen with stable cardiomegaly.",
             "A small right pleural effusion is noted; unchanged heart "
             "enlargement."),
            ("No acute osseous abnormality.",
             "The lungs are well expanded and clear."),
            ("edema edema edema", "there is mild pulmonary oedema"),
            ("Right lower lobe opacity concerning for pneumonia.",
             "Concerning pneumonia opacity in the right lower lobe."),
        ]
        for hyp_txt, ref_txt in cases:
            hyp, ref = tokenize_report(hyp_txt), tokenize_report(ref_txt)
            ours = _meteor_segment([ref], hyp)
            theirs = single_meteor_score(ref, hyp, wordnet=_FakeWordnet())
            assert abs(ours - theirs) < 1e-12, (hyp_txt, ours, theirs)

    def test_evaluate_reports_end_to_end(self):
        preds = {"d1": "The lungs are clear. No pleural effusion.",
                 "d2": "Moderate cardiomegaly is present."}
        gts = {"d1": "The lungs are clear. No pleural effusion.",
               "d2": "There is moderate cardiomegaly."}
        s = evaluate_reports(preds, gts)
        assert s.bleu1 > 0.5 and s.rouge_l > 0.5 and 0 < s.agg_metrics <= 1
        d = s.as_dict()
        assert set(d) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                          "ROUGE_L", "agg_metrics"}

    def test_mismatched_ids_raise(self):
        with pytest.raises(ValueError):
            evaluate_reports({"a": "x"}, {"b": "x"})


class TestCEMetrics:
    def test_label_mapping(self):
        ids = np.array([[0, 1, 2, 3]])
        m = class_ids_to_label_matrix(ids)
        assert np.isnan(m[0, 0]) and m[0, 1] == 1 and m[0, 2] == 0 and m[0, 3] == -1
        b = map_labels_for_scoring(m)
        np.testing.assert_array_equal(b, [[0, 1, 0, 0]])

    def test_against_sklearn(self):
        sklearn = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(0)
        y = rng.integers(0, 2, (40, 14)).astype(float)
        p = rng.integers(0, 2, (40, 14)).astype(float)
        # sprinkle NaN/-1 to exercise the mapping
        y[rng.random((40, 14)) < 0.1] = np.nan
        p[rng.random((40, 14)) < 0.1] = -1
        got = ce_metrics(y, p)
        yb, pb = map_labels_for_scoring(y), map_labels_for_scoring(p)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            assert abs(got["chexbert_macro_f1"] -
                       sklearn.f1_score(yb, pb, average="macro")) < 1e-9
            assert abs(got["chexbert_macro_precision"] -
                       sklearn.precision_score(yb, pb, average="macro")) < 1e-9
            assert abs(got["chexbert_macro_recall"] -
                       sklearn.recall_score(yb, pb, average="macro")) < 1e-9
            assert abs(got["chexbert_sample_f1"] -
                       sklearn.f1_score(yb, pb, average="samples")) < 1e-9
            accs = [sklearn.accuracy_score(yb[:, i], pb[:, i]) for i in range(14)]
        assert abs(got["chexbert_mean_accuracy"] - np.mean(accs)) < 1e-9

    def test_csv_roundtrip(self, tmp_path):
        ids = np.array([[1, 2, 0, 3] + [0] * 10, [0, 1, 1, 2] + [0] * 10])
        reports = ['Lungs "clear".', "Cardiomegaly present."]
        pred_path = tmp_path / "predictions.csv"
        write_predictions_csv(reports, pred_path)
        lines = pred_path.read_text().splitlines()
        assert lines[0] == '"Lungs clear."'  # inner quotes stripped
        lab_path = tmp_path / "labels.csv"
        write_labels_csv(ids, reports, lab_path)
        mat = read_labels_csv(lab_path)  # CHEXPERT_COLS order
        # row0: Enlarged Cardiomediastinum=1 -> col index 1 in CHEXPERT_COLS
        assert mat[0, CHEXPERT_COLS.index("Enlarged Cardiomediastinum")] == 1
        assert mat[0, CHEXPERT_COLS.index("Cardiomegaly")] == 0
        assert np.isnan(mat[0, CHEXPERT_COLS.index("Lung Opacity")])
        assert mat[0, CHEXPERT_COLS.index("Lung Lesion")] == -1

    def test_conditions_constants(self):
        assert len(CHEXBERT_CONDITIONS) == 14 == len(CHEXPERT_COLS)
        assert set(CHEXBERT_CONDITIONS) == set(CHEXPERT_COLS)
        assert CHEXPERT_COLS[0] == "No Finding"
        assert CHEXBERT_CONDITIONS[-1] == "No Finding"
