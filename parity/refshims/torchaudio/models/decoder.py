"""ctc_decoder stand-in: greedy best-path decode with the reference
TopKDecoder's Hypothesis interface (the flashlight lexicon-free beam search
is unavailable; at beam_size 1 they coincide)."""

from dataclasses import dataclass
from typing import List

import torch


@dataclass
class CTCHypothesis:
    tokens: torch.Tensor
    words: List[str]
    score: float
    timesteps: torch.Tensor


def ctc_decoder(lexicon=None, tokens=None, blank_token="<blank>", sil_token="#",
                unk_word="<unk>", **kwargs):
    tokens = list(tokens or [])
    blank_id = tokens.index(blank_token) if blank_token in tokens else 0

    class _GreedyDecoder:
        def __call__(self, emissions, lengths=None):
            # emissions: (B, T, C) probabilities or log-probs
            best = emissions.argmax(dim=-1)  # (B, T)
            out = []
            for b in range(best.shape[0]):
                seq = best[b]
                if lengths is not None:
                    seq = seq[: int(lengths[b])]
                collapsed = torch.unique_consecutive(seq)
                toks = collapsed[collapsed != blank_id]
                out.append([
                    CTCHypothesis(
                        tokens=toks,
                        words=[],
                        score=0.0,
                        timesteps=torch.arange(len(toks)),
                    )
                ])
            return out

    return _GreedyDecoder()
