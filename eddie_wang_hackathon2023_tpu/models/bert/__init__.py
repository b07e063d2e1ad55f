from .model import BertConfig, BertModel, BertForQuestionAnswering, from_hf_bert
