"""MPC planner: obstacle grid builder, solver dispatch, QP refine, control."""
