from okvis2_tpu.solver.window_problem import WindowProblem, SolverConfig
from okvis2_tpu.solver.gauss_newton import solve_window, problem_cost

__all__ = ["WindowProblem", "SolverConfig", "solve_window", "problem_cost"]
