"""NLG metrics: BLEU-1..4, ROUGE-L, METEOR — pure Python, no Java.

Replaces pycocoevalcap (MIMICEvalCap, ReportDataset.py:384-452):
  * BLEU: corpus-level with clipped modified n-gram precision, the
    tiny/small smoothing and closest-reference brevity penalty of the MS-COCO
    BleuScorer (same published algorithm, reimplemented).
  * ROUGE-L: mean per-segment LCS F-measure with beta=1.2 (MS-COCO Rouge).
  * METEOR: nltk's meteor_score (exact/stem/wordnet-synonym stages,
    alpha=.9 beta=3 gamma=.5 — the METEOR 1.0 defaults). The reference uses
    the METEOR 1.5 Java jar which adds paraphrase tables; scores track
    closely but are not bit-identical. Documented deviation: no Java.
  * Tokenization: the reference runs nltk word_tokenize then lowercases
    (ReportDataset.py:427-431). word_tokenize = punkt sentence split +
    TreebankWordTokenizer; punkt needs a data download (unavailable
    offline), so we sentence-split on [.!?] whitespace boundaries and apply
    TreebankWordTokenizer per sentence — identical output on radiology
    report text in practice.
"""
from __future__ import annotations

import math
import re
from collections import Counter
from typing import Dict, Iterable, List, NamedTuple, Sequence

from nltk.tokenize.treebank import TreebankWordTokenizer

_TREEBANK = TreebankWordTokenizer()
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def preprocess_report(s: str) -> str:
    """ReportDataset.py:401-405: drop newlines and <s>/</s> markers."""
    return s.replace("\n", "").replace("<s>", "").replace("</s>", "")


def tokenize_report(s: str) -> List[str]:
    """word_tokenize-equivalent (see module docstring), lowercased."""
    toks: List[str] = []
    for sent in _SENT_SPLIT.split(preprocess_report(s).strip()):
        if sent:
            toks.extend(_TREEBANK.tokenize(sent))
    return [t.lower() for t in toks]


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def corpus_bleu(gts: Dict[str, List[List[str]]], res: Dict[str, List[str]],
                max_n: int = 4) -> List[float]:
    """Corpus BLEU-1..max_n, MS-COCO BleuScorer semantics.

    gts: id -> list of reference token lists; res: id -> hypothesis tokens.
    Clipped counts summed over the corpus; brevity penalty from the
    closest-length reference; smoothing: (correct+tiny)/(guess+small).
    """
    small, tiny = 1e-9, 1e-15
    correct = [0.0] * max_n
    guess = [0.0] * max_n
    testlen = 0
    reflen = 0
    for key, hyp in res.items():
        refs = gts[key]
        testlen += len(hyp)
        # closest reference length (ties -> shorter, as in BleuScorer)
        reflen += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            hyp_ng = _ngrams(hyp, n)
            max_ref: Counter = Counter()
            for r in refs:
                for ng, c in _ngrams(r, n).items():
                    max_ref[ng] = max(max_ref[ng], c)
            guess[n - 1] += max(0, len(hyp) - n + 1)
            correct[n - 1] += sum(min(c, max_ref[ng]) for ng, c in hyp_ng.items())

    bleus: List[float] = []
    logp = 0.0
    ratio = (testlen + tiny) / (reflen + small)
    bp = math.exp(1 - 1 / ratio) if ratio < 1 else 1.0
    for n in range(max_n):
        logp += math.log((correct[n] + tiny) / (guess[n] + small))
        bleus.append(math.exp(logp / (n + 1)) * bp)
    return bleus


def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(prev[j] + 1 if x == y else max(cur[j], prev[j + 1]))
        prev = cur
    return prev[-1]


def rouge_l_corpus(gts: Dict[str, List[List[str]]], res: Dict[str, List[str]],
                   beta: float = 1.2) -> float:
    """Mean per-segment ROUGE-L F (MS-COCO Rouge: beta=1.2, max over refs)."""
    scores = []
    for key, hyp in res.items():
        best = 0.0
        for ref in gts[key]:
            lcs = _lcs_len(hyp, ref)
            p = lcs / len(hyp) if hyp else 0.0
            r = lcs / len(ref) if ref else 0.0
            f = ((1 + beta ** 2) * p * r / (r + beta ** 2 * p)
                 if p > 0 and r > 0 else 0.0)
            best = max(best, f)
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


def meteor_corpus(gts: Dict[str, List[List[str]]], res: Dict[str, List[str]]) -> float:
    """Mean per-segment METEOR (exact + Porter-stem stages, no data files)."""
    scores = [_meteor_segment(gts[key], hyp) for key, hyp in res.items()]
    return sum(scores) / max(len(scores), 1)


def _meteor_segment(refs: List[List[str]], hyp: List[str],
                    alpha: float = 0.9, beta: float = 3.0,
                    gamma: float = 0.5) -> float:
    """METEOR for one segment, max over references.

    Standard published algorithm (Banerjee & Lavie 2005 with the 1.0
    defaults nltk also uses): greedy sequential alignment by exact match,
    then by Porter stem on the leftovers; F_mean = PR/(αP+(1-α)R);
    fragmentation penalty γ·(chunks/matches)^β.
    """
    from nltk.stem.porter import PorterStemmer
    stemmer = PorterStemmer()
    best = 0.0
    for ref in refs:
        if not hyp or not ref:
            continue
        align = _align(hyp, ref, stemmer)
        m = len(align)
        if m == 0:
            continue
        p, r = m / len(hyp), m / len(ref)
        fmean = p * r / (alpha * p + (1 - alpha) * r)
        chunks = _chunk_count(sorted(align))
        penalty = gamma * (chunks / m) ** beta
        best = max(best, fmean * (1 - penalty))
    return best


def _align(hyp: Sequence[str], ref: Sequence[str], stemmer) -> List[tuple]:
    """Greedy (hyp_idx, ref_idx) alignment: exact stage then stem stage."""
    used_h: set = set()
    used_r: set = set()
    pairs: List[tuple] = []
    for key_fn in (lambda t: t, stemmer.stem):
        ref_keys = [key_fn(t) for t in ref]
        for i, t in enumerate(hyp):
            if i in used_h:
                continue
            k = key_fn(t)
            for j, rk in enumerate(ref_keys):
                if j not in used_r and rk == k:
                    used_h.add(i)
                    used_r.add(j)
                    pairs.append((i, j))
                    break
    return pairs


def _chunk_count(align_sorted: List[tuple]) -> int:
    """Number of maximal monotonic contiguous runs in the alignment."""
    chunks = 0
    prev = None
    for hi, ri in align_sorted:
        if prev is None or hi != prev[0] + 1 or ri != prev[1] + 1:
            chunks += 1
        prev = (hi, ri)
    return chunks


class NLGScores(NamedTuple):
    bleu1: float
    bleu2: float
    bleu3: float
    bleu4: float
    meteor: float
    rouge_l: float

    @property
    def agg_metrics(self) -> float:
        return sum(self) / len(self)

    def as_dict(self) -> Dict[str, float]:
        d = {"Bleu_1": self.bleu1, "Bleu_2": self.bleu2, "Bleu_3": self.bleu3,
             "Bleu_4": self.bleu4, "METEOR": self.meteor, "ROUGE_L": self.rouge_l}
        d["agg_metrics"] = self.agg_metrics
        return d


def evaluate_reports(predictions: Dict[str, str], references: Dict[str, str]) -> NLGScores:
    """The MIMICEvalCap contract: id -> generated findings vs id -> GT
    findings. Both sides tokenized + lowercased identically."""
    if set(predictions) != set(references):
        raise ValueError("prediction and reference ids differ")
    res = {k: tokenize_report(v) for k, v in predictions.items()}
    gts = {k: [tokenize_report(v)] for k, v in references.items()}
    b1, b2, b3, b4 = corpus_bleu(gts, res)
    return NLGScores(b1, b2, b3, b4, meteor_corpus(gts, res),
                     rouge_l_corpus(gts, res))
