"""Command-line entry points:

    python -m prior_flow_tpu.cli.demo        # random-pair smoke test
    python -m prior_flow_tpu.cli.demo_image  # pretrained inference + viz
    python -m prior_flow_tpu.cli.evaluate    # EPE/SEPE validation
    python -m prior_flow_tpu.cli.train       # training
    python -m prior_flow_tpu.cli.export      # StableHLO serving artifact
    python -m prior_flow_tpu.cli.video       # sequence inference, warm start
"""
