"""refimpl — NumPy/OpenCV reference-equivalent pipeline.

Serves three roles at once (SURVEY.md §7.1):
  1. the golden-test oracle (OpenCV 5.0.0 is the bit-compatibility target),
  2. the CPU baseline the >=50x throughput target is measured against
     (BASELINE.json:5,7),
  3. the behavioral model of the reference's pass-1 loop (SURVEY.md §3.2).
"""
