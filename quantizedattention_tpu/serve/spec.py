"""Prompt-lookup speculative drafting (host-side policy).

Draft source for the engine's speculative decode mode (spec_decode=k):
the next k tokens are proposed by matching the sequence's own trailing
n-gram against earlier occurrences in prompt+generation — "prompt lookup
decoding". No draft model, no extra device work: proposals come from the
tokens the host already has, and the device-side verify step
(models/transformer.py:verify_step_batched) makes ANY draft content safe —
a wrong draft costs nothing beyond the work the step did anyway, a right
draft banks an extra token per position.

No reference counterpart (the reference has no serving layer, SURVEY.md
§1); greedy token-exactness is guaranteed by construction because every
draft token is checked against the model's own argmax before it counts.
"""

from __future__ import annotations


def propose_lookup(
    history: list[int], k: int, max_ngram: int = 3, min_ngram: int = 1
) -> list[int]:
    """Propose up to k continuation tokens for `history` by n-gram lookup.

    Tries the longest trailing n-gram first (n = max_ngram .. min_ngram);
    for the first n with an earlier occurrence (most recent match wins),
    returns the tokens that followed it, truncated to k. Returns [] when
    nothing matches — the caller pads (padding is harmless: unverified
    drafts are simply rejected).
    """
    if k < 1 or len(history) < min_ngram + 1:
        return []
    for n in range(min(max_ngram, len(history) - 1), min_ngram - 1, -1):
        suffix = history[-n:]
        # scan right-to-left over earlier windows (recency bias: the most
        # recent prior occurrence predicts the continuation best)
        for i in range(len(history) - n - 1, -1, -1):
            if history[i : i + n] == suffix:
                out = history[i + n : i + n + k]
                if out:
                    return out
    return []
