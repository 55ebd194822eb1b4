"""bp_osd_tpu.sim"""
