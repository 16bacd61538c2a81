#!/usr/bin/env python
"""Prompt-lookup acceptance on REALISTIC (non-degenerate) eval transcripts.

tools/bench_spec.py measures the speculative engine's wall-clock cost per
verification forward on the real TPU, but its acceptance column is
meaningless there: random weights emit degenerate repetitive text, which
prompt-lookup catches trivially (the ngram row's 5.9/6 is an artifact —
verify SKILL.md). What a user actually gets from `--spec` on the
automated-correction pass depends on how much of the TRUE output text is
findable in the prompt — a property of (drafter, text) alone, independent
of the model weights. This tool measures exactly that, on synthesized but
realistic correction transcripts:

  prompt  = Vicuna system prompt + RG instruction + generated report
            + the byte-exact correction turn (data/downstream.py
            correction_prompt — the reference's automated_correction.py
            strings), i.e. the real test.py:440-533 batch-1 workload;
  output  = the corrected report: the original with the false-positive
            sentence removed / the false-negative sentence added, the
            other ~6 sentences verbatim — which is what a model that
            follows "Don't make other changes." emits.

The simulation runs the SHIPPED drafter (decode/speculative.ngram_propose,
imported, not re-implemented) under teacher forcing: with greedy decoding
the model's token after any correctly-accepted prefix IS the true output
token, so accepted-draft counting needs no model at all. The one
unknowable is the engine's stale-history writes (the (k+1)-block entries
past the accepted point, model predictions under a rejected context): a
draft slice that runs past the live length reads them. We bracket:

  opt   — stale entries coincide with the true continuation (acceptance
          upper bound);
  pess  — stale entries are junk that never matches (lower bound).

When no draft ever reads past the live length the bracket is TIGHT (both
variants equal the real engine's iteration count exactly — pinned against
spec_decode_loop in tests/test_spec_acceptance.py via the stale_reads==0
certificate this simulator emits).

Tokenization: word + punctuation tokens (no Vicuna tokenizer ships in
this container). BPE would split rare words into pieces, lengthening both
the matched spans and the output in the same proportion, so
accepted-per-forward is a fair granularity proxy; the absolute tok/s
implied below inherits it.

Prints one JSON line per workload:
  correction — the spec target (output echoes the prompt);
  rg         — report generation from findings keywords only (the no-echo
               floor; RaDialog serves this batched, never via spec).
Each carries forwards + accepted-per-forward (opt/pess) and the implied
tok/s at the TPU-measured per-forward costs (defaults from
tools/bench_spec.py on the serving weights: plain 10.6 ms, k=5 verify
11.3 ms — override with --ms-plain/--ms-verify when re-measured).

Usage: python tools/spec_acceptance.py [--k 5] [--m 3] [--n 24]
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Realistic per-finding report sentences (MIMIC-CXR phrasing style; the
# fixture corpus in tests/fixtures/sectioned.csv uses the same register but
# is too short for 256-token correction turns).
FINDING_SENTENCES: Dict[str, str] = {
    "Cardiomegaly": ("The cardiac silhouette is enlarged, stable in "
                     "appearance compared to the prior examination."),
    "Edema": ("There is mild interstitial pulmonary edema with perihilar "
              "haziness and vascular indistinctness."),
    "Pneumonia": ("Patchy right lower lobe opacity is concerning for "
                  "pneumonia in the appropriate clinical setting."),
    "Pleural Effusion": ("Small bilateral pleural effusions are present, "
                         "slightly increased from the prior study."),
    "Atelectasis": ("Linear opacities at the left base are most consistent "
                    "with subsegmental atelectasis."),
    "Pneumothorax": ("There is a small right apical pneumothorax without "
                     "evidence of tension."),
    "Consolidation": ("Focal consolidation is identified in the lingula, "
                      "which may represent aspiration or infection."),
    "Lung Opacity": ("Diffuse bilateral hazy opacities are again "
                     "demonstrated, grossly unchanged."),
    "Fracture": ("There is an acute displaced fracture of the left fifth "
                 "posterior rib."),
    "Support Devices": ("An endotracheal tube terminates approximately 4 cm "
                        "above the carina; a nasogastric tube courses below "
                        "the diaphragm."),
}
BASE_SENTENCES = [
    "The lungs are otherwise clear without focal consolidation.",
    "No pneumothorax is identified on the current examination.",
    "The mediastinal and hilar contours are within normal limits.",
    "The visualized osseous structures are intact.",
    "Degenerative changes are noted in the thoracic spine.",
    "The upper abdomen is unremarkable on the included views.",
]
SYSTEM = ("A chat between a curious user and an artificial intelligence "
          "assistant. The assistant gives helpful, detailed, and polite "
          "answers to the user's questions.")
RG_INSTRUCTION = ("Image information: " + "<IMG>" * 32 +
                  ". Predicted Findings: {findings}. You are to act as a "
                  "radiologist and write the finding section of a chest "
                  "x-ray radiology report for this X-ray image given the "
                  "predicted findings. Write in the style of a professional "
                  "radiology report.")

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def tokenize(text: str, vocab: Dict[str, int]) -> np.ndarray:
    ids = [vocab.setdefault(w, len(vocab) + 3) for w in _TOKEN_RE.findall(text)]
    return np.asarray(ids, np.int32)


def make_transcript(rng: np.random.Generator,
                    vocab: Dict[str, int]) -> Tuple[np.ndarray, np.ndarray,
                                                    np.ndarray]:
    """One correction study -> (prompt ids, corrected-output ids, rg ids)."""
    from radialog_tpu.data.downstream import correction_prompt

    names = list(FINDING_SENTENCES)
    present = sorted(rng.choice(len(names), size=4, replace=False))
    fp_name = names[present[0]]                  # predicted, not actually there
    fn_name = names[[i for i in range(len(names)) if i not in present][0]]
    report_sents = [FINDING_SENTENCES[names[i]] for i in present]
    base = list(rng.choice(BASE_SENTENCES, size=3, replace=False))
    order = rng.permutation(len(report_sents) + len(base))
    sents = (report_sents + base)
    report = " ".join(sents[i] for i in order)

    corrected = [s for s in sents if s != FINDING_SENTENCES[fp_name]]
    corrected.append(FINDING_SENTENCES[fn_name])
    corrected_report = " ".join(corrected)

    findings = ", ".join(names[i].lower() for i in present)
    turn = correction_prompt([fp_name], [fn_name])
    prompt = (SYSTEM + " USER: " + RG_INSTRUCTION.format(findings=findings) +
              " ASSISTANT: " + report + "</s>USER: " + turn + " ASSISTANT:")
    return (tokenize(prompt, vocab), tokenize(corrected_report, vocab),
            tokenize(report, vocab))


def simulate(prompt: np.ndarray, output: np.ndarray, k: int, m: int,
             optimistic: bool) -> Dict[str, int]:
    """Teacher-forced run of the engine's speculative loop over the shipped
    drafter. Mirrors decode/speculative.spec_decode_loop exactly: c counts
    emitted tokens (token 0 comes from the prefill forward), each iteration
    drafts k, accepts the longest true-prefix match, emits accepted+1, and
    writes the whole (k+1) block into history. ``stale_reads`` counts
    iterations whose draft slice ran past the live length — when 0, opt and
    pess coincide with the real engine's behavior exactly."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from radialog_tpu.decode.speculative import ngram_propose

    pl, n = len(prompt), len(output)
    hist = np.full(pl + n + k + 1, -1, np.int32)
    hist[:pl] = prompt
    hist[pl] = output[0]
    propose = jax.jit(lambda h, hl: ngram_propose(h, hl, k=k, m=m))

    c, iters, stale_reads = 1, 0, 0
    while c < n:
        hl = pl + c
        draft = np.asarray(propose(jnp.asarray(hist), jnp.asarray(hl)))
        true = output[c:c + k]
        acc = 0
        while acc < len(true) and draft[acc] == true[acc]:
            acc += 1
        emit = min(acc + 1, n - c)
        # engine writes all k+1 block outputs; entries past `emit` are the
        # model's off-path predictions we cannot know -> bracket
        blk_end = min(pl + c + k + 1, len(hist))
        if optimistic:
            span = output[c:c + (blk_end - (pl + c))]
            hist[pl + c:pl + c + len(span)] = span
        else:
            hist[pl + c:pl + c + emit] = output[c:c + emit]
            hist[pl + c + emit:blk_end] = -1
        # did the drafter read past the live region this step?
        # (re-derive the slice start the same way ngram_propose does;
        # start < 0 = the no-match fallback, which repeats the last live
        # token and never reads ahead)
        start = _draft_start(hist, hl, k, m)
        if start >= 0 and start + k > hl:
            stale_reads += 1
        c += emit
        iters += 1
    return {"iters": iters, "forwards": iters + 1, "out_tokens": n,
            "stale_reads": stale_reads}


def _draft_start(hist: np.ndarray, hl: int, k: int, m: int) -> int:
    """Where ngram_propose's draft slice starts (host-side mirror, only used
    for the stale_reads certificate). Returns -1 for the no-match fallback
    (draft = last token repeated, reads nothing ahead)."""
    if hl <= m:
        return -1
    pattern = hist[hl - m:hl]
    best = -1
    for i in range(hl - m):
        if (hist[i:i + m] == pattern).all():
            best = i
    if best < 0:
        return -1
    return min(max(best + m, 0), len(hist) - k)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--m", type=int, default=3)
    ap.add_argument("--n", type=int, default=24, help="transcripts")
    ap.add_argument("--ms-plain", type=float, default=10.6,
                    help="TPU ms per 1-token forward (bench_spec plain row)")
    ap.add_argument("--ms-verify", type=float, default=11.3,
                    help="TPU ms per (k+1)-token verify forward (bench_spec)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    vocab: Dict[str, int] = {}
    studies = [make_transcript(rng, vocab) for _ in range(args.n)]

    for task, pairs in (
            ("correction", [(p, y) for p, y, _ in studies]),
            ("rg", [(tokenize(SYSTEM + " USER: ", vocab), y)
                    for _, _, y in studies])):
        rows = {v: [simulate(p, y, args.k, args.m, optimistic=(v == "opt"))
                    for p, y in pairs] for v in ("opt", "pess")}
        out_tok = float(np.mean([r["out_tokens"] for r in rows["pess"]]))
        rec: Dict[str, object] = {"task": task, "k": args.k, "m": args.m,
                                  "n": args.n,
                                  "mean_out_tokens": round(out_tok, 1)}
        for v in ("opt", "pess"):
            fw = float(np.mean([r["forwards"] for r in rows[v]]))
            acc = float(np.mean([r["out_tokens"] / r["forwards"]
                                 for r in rows[v]]))
            tok_s = 1e3 * acc / args.ms_verify
            rec[v] = {"forwards": round(fw, 1),
                      "accepted_per_forward": round(acc, 2),
                      "implied_tok_s": round(tok_s, 1),
                      "stale_read_iters": int(sum(r["stale_reads"]
                                                  for r in rows[v]))}
        rec["plain_tok_s"] = round(1e3 / args.ms_plain, 1)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
