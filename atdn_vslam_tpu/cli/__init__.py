"""Command-line entry points (run as ``python -m atdn_vslam_tpu.cli.<name>``).

Parity surface for the reference's root-level scripts:
  train_odometry     <- ref train_odometry.py
  evaluate_odometry  <- ref evaluate_odometry.py
  train_mapping      <- ref train_localization.py / NeuralSLAM.__create_map
  kalman             <- ref atdn_vslam/eval/kalman.py CLI
  visualize          <- ref atdn_vslam/eval/visualizer.py CLI
  precompute_flows   <- the flows2 precompute tool the reference
                        gitignored (SURVEY.md 2.14)
  slam_demo          <- ref test_slam.py end-to-end life cycle
"""
