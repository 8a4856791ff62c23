"""Selective rematerialization policies (VERDICT r4 #4).

Blanket `jax.checkpoint` (policy=None — save NOTHING, recompute the whole
block in backward) is the round-4 default for the 224² models whose
autodiff temporaries exceed a v5e's HBM.  The standard middle ground is a
checkpoint POLICY: save the cheap-to-store intermediates and recompute
only the wide ones.  The hot memory in every KAN conv is the basis
expansion — a (B, *S, K*C) tensor K+1 times wider than its input — so
`nn/kan_conv.py` tags it `checkpoint_name(..., 'kan_basis')` and the
policies here select against that name.

Policies (model ctor arg `remat_policy`, bench `--remat_policy`):
  None / 'full'     — save nothing: maximum recompute, minimum HBM
                      (round-4 behavior).
  'except_basis'    — save EVERYTHING except the tagged wide basis
                      tensors: the backward recomputes only the cheap
                      elementwise expansion from its narrow input; all
                      conv/norm outputs are stored.
  'dots'            — jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
                      the stock save-matmuls policy.  Convs are NOT
                      dot_general, so on these conv trunks it approximates
                      'full'; measured for completeness.
  'offload_basis'   — offload the tagged basis tensors to pinned host
                      memory instead of recomputing (needs working
                      device↔host DMA bandwidth; through the remote-TPU
                      tunnel this is expected to lose — measure, don't
                      assume).
"""

from __future__ import annotations


def resolve_remat_policy(name):
    """Map a policy name to a jax.checkpoint policy callable (or None =
    save-nothing, the plain-remat default)."""
    if name in (None, "", "full", "nothing"):
        return None
    import jax

    cp = jax.checkpoint_policies
    if name == "dots":
        return cp.dots_with_no_batch_dims_saveable
    if name == "except_basis":
        return cp.save_anything_except_these_names("kan_basis")
    if name == "offload_basis":
        return cp.save_and_offload_only_these_names(
            names_which_can_be_saved=[],
            names_which_can_be_offloaded=["kan_basis"],
            offload_src="device", offload_dst="pinned_host")
    raise ValueError(
        f"unknown remat_policy {name!r}; pick one of "
        "full | except_basis | dots | offload_basis")
