from .conversation import (Conversation, DEMO_SYSTEM, RADIALOG_SYSTEM,
                           extract_assistant_reply, extract_report,
                           single_turn_prompt)
from .prompts import (IMG_RUN, N_IMG_TOKENS, ReportPrompt, VICUNA_PROMPTS,
                      load_prompt_bank, structured_findings_string)
from .section_parser import (build_sectioned_csv, custom_mimic_cxr_rules,
                             parse_report, parse_report_with_rules,
                             split_sections)
from .datasets import (CHEXPERT_COLS, MimicPaths, ReportGenData, Stage1Data,
                       balanced_epoch_indices, load_instruct_dataset,
                       split_report_instruct, stratified_indices)
from .tokenization import (IGNORE_INDEX, Prompter, WhitespaceTokenizer,
                           load_vicuna_tokenizer, pad_batch_right,
                           pad_labels_right, tokenize_with_masked_prompt)
