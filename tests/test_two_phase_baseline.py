"""CPU smoke of the measured-baseline reconstruction
(tools/two_phase_baseline.py): the two-phase pipeline must run end to
end on a tiny flagship-shaped model and report a sane breakdown — this
is bench.py's denominator, so it must keep working as the executor
evolves."""

import jax

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.models.netgen import NetgenConfig
from n2nmn_tpu.models.nmn import NMNConfig, NMNModel
from n2nmn_tpu.tools.two_phase_baseline import run_two_phase_baseline

from tests.test_executor import CLEVR_VOCAB


def test_two_phase_baseline_smoke(tmp_path):
    grammar = ModuleGrammar(CLEVR_VOCAB)
    net_cfg = NetgenConfig(
        num_vocab_txt=30, embed_dim_txt=8, num_vocab_nmn=grammar.num_vocab,
        embed_dim_nmn=8, lstm_dim=16, num_layers=1, T_decoder=6,
        decoder_sampling=False, mask_mode="grammar")
    cfg = NMNConfig(flavor="clevr", netgen=net_cfg, num_choices=7,
                    H_feat=3, W_feat=4, D_feat=6)
    model = NMNModel(cfg, grammar)
    params = model.init(jax.random.PRNGKey(0))

    res = run_two_phase_baseline(
        model, params, feature_dir=str(tmp_path / "feats"),
        num_questions=16, batch_size=8, T_enc=7, num_vocab_txt=30,
        warmup_batches=1)
    assert res["qps"] > 0
    assert res["total_s"] > 0
    assert res["host_assemble_s"] >= 0
    assert res["device_and_fetch_s"] > 0
