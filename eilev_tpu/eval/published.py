"""The reference's PUBLISHED quality numbers (hard-coded in
/root/reference/figures/icl_eval_figures.ipynb cell sources; outputs stripped).
Shared by scripts/plot_results.py and scripts/verify_quality.py — the
end-to-end quality-parity gate diffs a real checkpoint's metrics against these.
"""

# Ego4D held-out eval, EILeV blip2-opt-2.7b (icl_eval_figures.ipynb cell 3)
EGO4D_OPT_2_7B = {
    0: {"rougeL": 0.2315, "bleu": 0.0088, "sts_biencoder": 0.3278},
    16: {"rougeL": 0.6296, "bleu": 0.3049, "sts_biencoder": 0.6936, "bertscore_f1": 0.6529},
}

# Ego4D held-out eval, EILeV blip2-flan-t5-xl (cell 3)
EGO4D_FLAN_T5_XL = {
    16: {"rougeL": 0.6230, "bleu": 0.2913, "sts_biencoder": 0.6948},
}

# Out-of-distribution (EPIC-KITCHENS), EILeV blip2-opt-2.7b (cell 7)
EPIC_KITCHENS_OPT_2_7B = {
    16: {"rougeL": 0.8725, "bleu": 0.6677, "sts_biencoder": 0.8704},
}

# Novel/rare-action split, EILeV blip2-opt-2.7b (cell 11)
NOVEL_OPT_2_7B = {
    16: {"rougeL": 0.6606, "bleu": 0.3145, "sts_biencoder": 0.7512},
}

TABLES = {
    "ego4d-opt-2.7b": EGO4D_OPT_2_7B,
    "ego4d-flan-t5-xl": EGO4D_FLAN_T5_XL,
    "epic-kitchens-opt-2.7b": EPIC_KITCHENS_OPT_2_7B,
    "novel-opt-2.7b": NOVEL_OPT_2_7B,
}
