from n2nmn_tpu.layout.grammar import ModuleGrammar, MODULE_ARITY, MODULE_OUTPUT_TYPE
from n2nmn_tpu.layout.assembler import Assembler, INVALID_EXPR
