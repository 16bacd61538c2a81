from .nlg import (NLGScores, corpus_bleu, evaluate_reports, meteor_corpus,
                  rouge_l_corpus, tokenize_report)
from .ce_metrics import (CHEXBERT_CONDITIONS, CHEXPERT_COLS, ce_metrics,
                         class_ids_to_label_matrix, map_labels_for_scoring,
                         write_labels_csv, write_predictions_csv)

__all__ = ["NLGScores", "corpus_bleu", "evaluate_reports", "meteor_corpus",
           "rouge_l_corpus", "tokenize_report", "CHEXBERT_CONDITIONS",
           "CHEXPERT_COLS", "ce_metrics", "class_ids_to_label_matrix",
           "map_labels_for_scoring", "write_labels_csv",
           "write_predictions_csv"]
