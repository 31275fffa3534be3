"""Multiclass metric stand-ins with the call API the reference uses:
metric(preds (N, C) scores or (N,) labels, target (N,)) -> scalar tensor."""

import torch


class _Base:
    def __init__(self, num_classes, average="macro", **kwargs):
        self.num_classes = num_classes
        self.average = average

    def _labels(self, preds):
        if preds.ndim > 1:
            return preds.argmax(dim=-1)
        return preds

    def __call__(self, preds, target):
        return self.compute_value(preds, target)

    def to(self, device):
        return self


class MulticlassAccuracy(_Base):
    def compute_value(self, preds, target):
        labels = self._labels(preds)
        if self.average == "micro":
            return (labels == target).float().mean()
        accs = []
        for c in range(self.num_classes):
            mask = target == c
            if mask.any():
                accs.append((labels[mask] == c).float().mean())
        return torch.stack(accs).mean() if accs else torch.tensor(0.0)


class MulticlassF1Score(_Base):
    def compute_value(self, preds, target):
        labels = self._labels(preds)
        f1s = []
        for c in range(self.num_classes):
            tp = ((labels == c) & (target == c)).sum().float()
            fp = ((labels == c) & (target != c)).sum().float()
            fn = ((labels != c) & (target == c)).sum().float()
            denom = 2 * tp + fp + fn
            if (target == c).any() or (labels == c).any():
                f1s.append(2 * tp / denom if denom > 0 else torch.tensor(0.0))
        return torch.stack(f1s).mean() if f1s else torch.tensor(0.0)


class MulticlassAUROC(_Base):
    def compute_value(self, preds, target):
        # One-vs-rest AUROC via rank statistic; preds must be (N, C) scores.
        if preds.ndim == 1:
            return torch.tensor(0.5)
        aucs = []
        for c in range(self.num_classes):
            pos = target == c
            if not pos.any() or pos.all():
                continue
            scores = preds[:, c]
            order = scores.argsort()
            ranks = torch.empty_like(order, dtype=torch.float32)
            ranks[order] = torch.arange(len(scores), dtype=torch.float32) + 1
            n_pos, n_neg = pos.sum().float(), (~pos).sum().float()
            auc = (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
            aucs.append(auc)
        return torch.stack(aucs).mean() if aucs else torch.tensor(0.5)
