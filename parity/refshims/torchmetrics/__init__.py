"""torchmetrics stand-in (functional WER/WIL + multiclass wrappers)."""
