"""dffx.eval — evaluation CLIs preserving the reference command surface:

* ``python -m dffx.eval.test --dataset {DefocusNet,4D_Light_Field,DDFF,
  Smartphone,FlyingThings3D}``  (reference `Depth_Estimation_Test/test.py`)
* ``python -m dffx.eval.real_scenes``  (reference `End_to_End/test_real_scenes.py`)

Same constants, metric formulas, print strings and output files; the forward
runs as one jitted XLA program per static dataset shape on the TPU.
"""
